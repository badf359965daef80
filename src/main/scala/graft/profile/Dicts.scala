package graft.profile

/** Valid-value dictionaries for the semantic-type validators.
  *
  * Mirrors the role of the reference's constant lists
  * (`state_boroughs/scripts/ah4896_modules.zip!constants.py:8-36`) and its
  * `zips.json` dimension (`zip-lat-long-coords/zipcodes.zip`), re-derived
  * from public knowledge (US state lists, NYC boroughs, NYC zip prefixes).
  * The reference's dictionary bugs (missing comma fusing `"S.D." "Tenn."`,
  * syntax error at `check_states.py:49`) are deliberately not reproduced —
  * SURVEY.md §7 "hard parts" item 5.
  *
  * At cluster scale these are tiny broadcast dimensions: membership tests
  * compile to Catalyst `isin`/`array_contains` over literals (no shuffle,
  * no UDF); the larger zip dimension joins as a broadcast hash semi-join.
  */
object Dicts {

  /** 50 states + DC + common territories (Title Case canonical form). */
  val StateNames: Seq[String] = Seq(
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana",
    "Maine", "Maryland", "Massachusetts", "Michigan", "Minnesota",
    "Mississippi", "Missouri", "Montana", "Nebraska", "Nevada",
    "New Hampshire", "New Jersey", "New Mexico", "New York",
    "North Carolina", "North Dakota", "Ohio", "Oklahoma", "Oregon",
    "Pennsylvania", "Rhode Island", "South Carolina", "South Dakota",
    "Tennessee", "Texas", "Utah", "Vermont", "Virginia", "Washington",
    "West Virginia", "Wisconsin", "Wyoming",
    "District Of Columbia", "Puerto Rico", "Guam", "American Samoa",
    "Northern Mariana Islands")

  /** USPS two-letter acronyms (upper case). */
  val StateAcronyms: Seq[String] = Seq(
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA", "HI", "ID",
    "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD", "MA", "MI", "MN", "MS",
    "MO", "MT", "NE", "NV", "NH", "NJ", "NM", "NY", "NC", "ND", "OH", "OK",
    "OR", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV",
    "WI", "WY", "DC", "PR", "GU", "AS", "MP")

  /** AP-style abbreviations, stored lower-case, punctuation stripped
    * (matching is done on `lower(translate(col, ". ", ""))`). */
  val StateAbbrevs: Seq[String] = Seq(
    "ala", "ariz", "ark", "calif", "colo", "conn", "del", "fla", "ga",
    "ill", "ind", "kan", "ky", "la", "md", "mass", "mich", "minn", "miss",
    "mo", "mont", "neb", "nev", "nh", "nj", "nm", "ny", "nc", "nd", "okla",
    "ore", "pa", "ri", "sc", "sd", "tenn", "tex", "vt", "va", "wash",
    "wva", "wis", "wyo")

  /** NYC boroughs, Title Case canonical form
    * (reference `constants.py:8`). */
  val BoroNames: Seq[String] = Seq(
    "Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island")

  /** Borough 2-letter abbreviations (reference `constants.py:10`). */
  val BoroAbbrevs: Seq[String] = Seq("Mn", "Bn", "Qn", "Bx", "SI")

  /** Small registered-zip dimension (real NYC-area zips) standing in for
    * the reference's 42,632-entry `zips.json`. At scale this would be
    * `spark.read.json(zipsPath)` broadcast; the membership semantics are
    * identical. Kept small + inline so the DuckDB oracle can replicate it
    * as a literal IN-list (SURVEY.md §7 planned queries). */
  val NycZips: Seq[String] = Seq(
    "10001", "10002", "10003", "10004", "10005", "10006", "10007", "10009",
    "10010", "10011", "10012", "10013", "10014", "10016", "10017", "10018",
    "10019", "10021", "10022", "10023", "10024", "10025", "10026", "10027",
    "10028", "10029", "10030", "10031", "10032", "10033", "10034", "10035",
    "10036", "10038", "10039", "10040", "10044", "10065", "10075", "10128",
    "10280", "10282",
    "10451", "10452", "10453", "10454", "10455", "10456", "10457", "10458",
    "10459", "10460", "10461", "10462", "10463", "10464", "10465", "10466",
    "10467", "10468", "10469", "10470", "10471", "10472", "10473", "10474",
    "10475",
    "11201", "11203", "11204", "11205", "11206", "11207", "11208", "11209",
    "11210", "11211", "11212", "11213", "11214", "11215", "11216", "11217",
    "11218", "11219", "11220", "11221", "11222", "11223", "11224", "11225",
    "11226", "11228", "11229", "11230", "11231", "11232", "11233", "11234",
    "11235", "11236", "11237", "11238", "11239",
    "11101", "11102", "11103", "11104", "11105", "11106", "11354", "11355",
    "11356", "11357", "11358", "11360", "11361", "11362", "11363", "11364",
    "11365", "11366", "11367", "11368", "11369", "11370", "11372", "11373",
    "11374", "11375", "11377", "11378", "11379", "11385", "11411", "11412",
    "11413", "11414", "11415", "11416", "11417", "11418", "11419", "11420",
    "11421", "11422", "11423", "11426", "11427", "11428", "11429", "11430",
    "11432", "11433", "11434", "11435", "11436",
    "10301", "10302", "10303", "10304", "10305", "10306", "10307", "10308",
    "10309", "10310", "10312", "10314")

  /** NANP area codes observed in the NYC metro (structural NANP validity —
    * area code / exchange must not start with 0 or 1 — is checked by
    * expression; this set backs the stricter "real area code" probe that
    * replaces the reference's `phonenumbers` library call,
    * `phone-number-v1.py:88-99`, see SURVEY.md S3). */
  val NycAreaCodes: Seq[String] = Seq(
    "201", "203", "212", "213", "215", "216", "301", "302", "303", "305",
    "312", "315", "347", "404", "405", "406", "407", "408", "410", "412",
    "415", "516", "518", "551", "585", "607", "609", "610", "617",
    "628", "631", "646", "650", "702", "703", "704", "713", "716", "718",
    "719", "720", "727", "732", "760", "773", "778", "781", "785",
    "786", "814", "815", "816", "817", "832", "845", "848", "862", "875",
    "901", "914", "917", "919", "929", "934", "973")

  /** Known top-level domains for the email/url validators' "plausible but
    * not real" code-5 check (the dictionary-membership move of S16/S19
    * applied to the new semantic types): a syntactically valid address on
    * an unknown TLD is shape-valid yet not a real instance. Deliberately
    * a short allowlist, like NycZips/NycAreaCodes — the reference's
    * dictionaries are also scoped snapshots, not the IANA registry. */
  val KnownTlds: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "us",
    "uk", "de", "fr", "jp", "ca", "au", "info", "biz", "dev", "app")
}
