package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic semantic-typed string columns synthesized from
  * `customer.c_custkey` (FIXTURES.md §B: validators are exercised on data
  * DuckDB can reproduce exactly). Every generator exists twice, side by
  * side: as a Spark `Column` and as the equivalent DuckDB SQL fragment —
  * both pure integer arithmetic + string literals, so the two engines
  * produce byte-identical values.
  *
  * The variants per type are chosen to cover all 5 QA codes, mirroring
  * the reference's golden-sample value shapes (FIXTURES.md §A4).
  */
object Synth {

  private val k = col("c_custkey")

  // -------- phone (covers codes 1,2,3,4,5) --------
  // m=0: +1 212 2xx-xxxx valid E.164            -> 1
  // m=1: 212-555-xxxx punctuated NANP           -> 2
  // m=2: 999-999-9999 repeated-digit sentinel   -> 4
  // m=3: ''                                     -> 4
  // m=4: 'hello' leading alpha                  -> 5
  // m=5: '+1018840042' area code starts 0       -> 3
  // m=6: 16 digits                              -> 5
  // m=7: +1 646 5xx-xxxx valid                  -> 1
  def phone: Column = {
    val m = k % 8
    when(m === 0, concat(lit("+1212"), lpad((lit(2000000) + k % 7999999).cast("string"), 7, "0")))
      .when(m === 1, concat(lit("212-555-"), lpad((k % 10000).cast("string"), 4, "0")))
      .when(m === 2, lit("999-999-9999"))
      .when(m === 3, lit(""))
      .when(m === 4, lit("hello"))
      .when(m === 5, lit("+1018840042"))
      .when(m === 6, lit("0123456789012345"))
      .otherwise(concat(lit("+1646"), lpad((lit(5000000) + k % 4999999).cast("string"), 7, "0")))
  }
  val phoneSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN concat('+1212', lpad(cast(2000000 + c_custkey % 7999999 AS VARCHAR), 7, '0'))
       WHEN 1 THEN concat('212-555-', lpad(cast(c_custkey % 10000 AS VARCHAR), 4, '0'))
       WHEN 2 THEN '999-999-9999'
       WHEN 3 THEN ''
       WHEN 4 THEN 'hello'
       WHEN 5 THEN '+1018840042'
       WHEN 6 THEN '0123456789012345'
       ELSE concat('+1646', lpad(cast(5000000 + c_custkey % 4999999 AS VARCHAR), 7, '0'))
       END"""

  /** Expected phone code per variant (used by the oracle). */
  val phoneCodeSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 4
       WHEN 4 THEN 5 WHEN 5 THEN 3 WHEN 6 THEN 5 ELSE 1 END"""

  /** Expected E.164 normalization per variant ('' for null-like). */
  val phoneNormSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN concat('+1212', lpad(cast(2000000 + c_custkey % 7999999 AS VARCHAR), 7, '0'))
       WHEN 1 THEN concat('+1212555', lpad(cast(c_custkey % 10000 AS VARCHAR), 4, '0'))
       WHEN 2 THEN '' WHEN 3 THEN ''
       WHEN 4 THEN 'hello'
       WHEN 5 THEN '1018840042'
       WHEN 6 THEN '0123456789012345'
       ELSE concat('+1646', lpad(cast(5000000 + c_custkey % 4999999 AS VARCHAR), 7, '0'))
       END"""

  // -------- US state --------
  // m=0 'New York'->1   m=1 'NY'->2         m=2 ' new york '->2
  // m=3 'N.Y.'->2       m=4 'Narnia'->3     m=5 'n/a'->4
  // m=6 'TEXAS'->2      m=7 'Wash.'->2
  def state: Column = {
    val m = k % 8
    when(m === 0, lit("New York")).when(m === 1, lit("NY"))
      .when(m === 2, lit(" new york ")).when(m === 3, lit("N.Y."))
      .when(m === 4, lit("Narnia")).when(m === 5, lit("n/a"))
      .when(m === 6, lit("TEXAS")).otherwise(lit("Wash."))
  }
  val stateSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 'New York' WHEN 1 THEN 'NY' WHEN 2 THEN ' new york '
       WHEN 3 THEN 'N.Y.' WHEN 4 THEN 'Narnia' WHEN 5 THEN 'n/a'
       WHEN 6 THEN 'TEXAS' ELSE 'Wash.' END"""
  val stateCodeSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 2
       WHEN 4 THEN 3 WHEN 5 THEN 4 WHEN 6 THEN 2 ELSE 2 END"""
  val stateNormSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 'New York' WHEN 1 THEN 'NY' WHEN 2 THEN 'New York'
       WHEN 3 THEN 'NY' WHEN 4 THEN 'Narnia' WHEN 5 THEN ''
       WHEN 6 THEN 'Texas' ELSE 'wash' END"""

  // -------- NYC borough --------
  // m=0 'Brooklyn'->1  m=1 'BRONX'->2  m=2 'Bx'->2
  // m=3 'Amherst St'->3  m=4 ''->4  m=5 'staten island'->2
  def boro: Column = {
    val m = k % 6
    when(m === 0, lit("Brooklyn")).when(m === 1, lit("BRONX"))
      .when(m === 2, lit("Bx")).when(m === 3, lit("Amherst St"))
      .when(m === 4, lit("")).otherwise(lit("staten island"))
  }
  val boroSql: String =
    """CASE c_custkey % 6
       WHEN 0 THEN 'Brooklyn' WHEN 1 THEN 'BRONX' WHEN 2 THEN 'Bx'
       WHEN 3 THEN 'Amherst St' WHEN 4 THEN '' ELSE 'staten island' END"""
  val boroCodeSql: String =
    """CASE c_custkey % 6
       WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 3
       WHEN 4 THEN 4 ELSE 2 END"""
  val boroNormSql: String =
    """CASE c_custkey % 6
       WHEN 0 THEN 'Brooklyn' WHEN 1 THEN 'Bronx' WHEN 2 THEN 'Bx'
       WHEN 3 THEN 'Amherst St' WHEN 4 THEN '' ELSE 'Staten Island' END"""

  // -------- zip --------
  // m=0 '10012'->1      m=1 '10012-1234'->1  m=2 '100121234'->2
  // m=3 '01310'->5(dict)/1(quick)  m=4 '123'->3  m=5 'n/a'->4
  // m=6 '99999'->5(dict)/1(quick)
  def zip: Column = {
    val m = k % 7
    when(m === 0, lit("10012")).when(m === 1, lit("10012-1234"))
      .when(m === 2, lit("100121234")).when(m === 3, lit("01310"))
      .when(m === 4, lit("123")).when(m === 5, lit("n/a"))
      .otherwise(lit("99999"))
  }
  val zipSql: String =
    """CASE c_custkey % 7
       WHEN 0 THEN '10012' WHEN 1 THEN '10012-1234' WHEN 2 THEN '100121234'
       WHEN 3 THEN '01310' WHEN 4 THEN '123' WHEN 5 THEN 'n/a'
       ELSE '99999' END"""
  val zipQuickCodeSql: String =
    """CASE c_custkey % 7
       WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 1
       WHEN 4 THEN 3 WHEN 5 THEN 4 ELSE 1 END"""
  val zipQuickNormSql: String =
    """CASE c_custkey % 7
       WHEN 0 THEN '10012' WHEN 1 THEN '10012-1234' WHEN 2 THEN '10012-1234'
       WHEN 3 THEN '01310' WHEN 4 THEN '123' WHEN 5 THEN ''
       ELSE '99999' END"""
  val zipDictCodeSql: String =
    """CASE c_custkey % 7
       WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 5
       WHEN 4 THEN 3 WHEN 5 THEN 4 ELSE 5 END"""
  val zipDictNormSql: String =
    """CASE c_custkey % 7
       WHEN 0 THEN '10012' WHEN 1 THEN '10012-1234' WHEN 2 THEN '10012-1234'
       WHEN 3 THEN '01310' WHEN 4 THEN '123' WHEN 5 THEN ''
       ELSE '99999' END"""

  // -------- latitude (standalone column semantics: out of range -> 5) ----
  // m=0 '40.NNNNNN'->1  m=1 '95.5'->5  m=2 '40.81N'->2
  // m=3 'abc'->3  m=4 'None'->4  m=5 '-12.345678'->1
  def lat: Column = {
    val m = k % 6
    when(m === 0, concat(lit("40."), lpad((k % 1000000).cast("string"), 6, "0")))
      .when(m === 1, lit("95.5"))
      .when(m === 2, lit("40.81N"))
      .when(m === 3, lit("abc"))
      .when(m === 4, lit("None"))
      .otherwise(concat(lit("-12."), lpad((k % 1000000).cast("string"), 6, "0")))
  }
  val latSql: String =
    """CASE c_custkey % 6
       WHEN 0 THEN concat('40.', lpad(cast(c_custkey % 1000000 AS VARCHAR), 6, '0'))
       WHEN 1 THEN '95.5' WHEN 2 THEN '40.81N' WHEN 3 THEN 'abc'
       WHEN 4 THEN 'None'
       ELSE concat('-12.', lpad(cast(c_custkey % 1000000 AS VARCHAR), 6, '0')) END"""
  val latCodeSql: String =
    """CASE c_custkey % 6
       WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 2 WHEN 3 THEN 3
       WHEN 4 THEN 4 ELSE 1 END"""
  val latNormSql: String =
    """CASE c_custkey % 6
       WHEN 0 THEN concat('40.', lpad(cast(c_custkey % 1000000 AS VARCHAR), 6, '0'))
       WHEN 1 THEN '95.5' WHEN 2 THEN '40.81' WHEN 3 THEN 'abc'
       WHEN 4 THEN ''
       ELSE concat('-12.', lpad(cast(c_custkey % 1000000 AS VARCHAR), 6, '0')) END"""

  // -------- longitude (standalone column semantics: out of range -> 5;
  // exercises the ±180 branch and the E/W suffix, `latlong-validate.py:38-62`) --
  // m=0 '73.NNNNNN'->1  m=1 '181.5'->5 (out of range)  m=2 '73.97W'->2
  // m=3 '-180'->1 (boundary)  m=4 'None'->4  m=5 '190.00E'->3 (stripped,
  // still out of range)  m=6 'abc'->3
  def longitude: Column = {
    val m = k % 7
    when(m === 0, concat(lit("73."), lpad((k % 1000000).cast("string"), 6, "0")))
      .when(m === 1, lit("181.5"))
      .when(m === 2, lit("73.97W"))
      .when(m === 3, lit("-180"))
      .when(m === 4, lit("None"))
      .when(m === 5, lit("190.00E"))
      .otherwise(lit("abc"))
  }
  val longitudeSql: String =
    """CASE c_custkey % 7
       WHEN 0 THEN concat('73.', lpad(cast(c_custkey % 1000000 AS VARCHAR), 6, '0'))
       WHEN 1 THEN '181.5' WHEN 2 THEN '73.97W' WHEN 3 THEN '-180'
       WHEN 4 THEN 'None' WHEN 5 THEN '190.00E'
       ELSE 'abc' END"""
  val longitudeCodeSql: String =
    """CASE c_custkey % 7
       WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 2 WHEN 3 THEN 1
       WHEN 4 THEN 4 WHEN 5 THEN 3 ELSE 3 END"""
  val longitudeNormSql: String =
    """CASE c_custkey % 7
       WHEN 0 THEN concat('73.', lpad(cast(c_custkey % 1000000 AS VARCHAR), 6, '0'))
       WHEN 1 THEN '181.5' WHEN 2 THEN '73.97' WHEN 3 THEN '-180'
       WHEN 4 THEN '' WHEN 5 THEN '190.00' ELSE 'abc' END"""

  // -------- coordinate pair --------
  // m=0 '(40.5754, -74.1078)'->1   m=1 '40.575 -74.107'->1
  // m=2 '92.09, 19.23' lat out of range -> 3   m=3 'None'->4  m=4 'foo'->3
  def coords: Column = {
    val m = k % 5
    when(m === 0, lit("(40.5754, -74.1078)"))
      .when(m === 1, lit("40.575 -74.107"))
      .when(m === 2, lit("92.09, 19.23"))
      .when(m === 3, lit("None"))
      .otherwise(lit("foo"))
  }
  val coordsSql: String =
    """CASE c_custkey % 5
       WHEN 0 THEN '(40.5754, -74.1078)' WHEN 1 THEN '40.575 -74.107'
       WHEN 2 THEN '92.09, 19.23' WHEN 3 THEN 'None' ELSE 'foo' END"""
  val coordsCodeSql: String =
    """CASE c_custkey % 5
       WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 4 ELSE 3 END"""

  // -------- email (covers codes 1,2,3,4,5) --------
  // m=0 user<k>@example.com          -> 1
  // m=1 ' User<k>@Example.COM '      -> 2 (case+padding; norm lowered)
  // m=2 ''                           -> 4
  // m=3 'n/a'                        -> 4
  // m=4 user<k>.example.com (no @)   -> 3
  // m=5 user@@example.com            -> 3
  // m=6 user<k>@example.zzz          -> 5 (unknown TLD)
  // m=7 ops<k>@data.org              -> 1
  def email: Column = {
    val m = k % 8
    when(m === 0, concat(lit("user"), k.cast("string"), lit("@example.com")))
      .when(m === 1, concat(lit(" User"), k.cast("string"), lit("@Example.COM ")))
      .when(m === 2, lit(""))
      .when(m === 3, lit("n/a"))
      .when(m === 4, concat(lit("user"), k.cast("string"), lit(".example.com")))
      .when(m === 5, lit("user@@example.com"))
      .when(m === 6, concat(lit("user"), k.cast("string"), lit("@example.zzz")))
      .otherwise(concat(lit("ops"), k.cast("string"), lit("@data.org")))
  }
  val emailSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN concat('user', cast(c_custkey AS VARCHAR), '@example.com')
       WHEN 1 THEN concat(' User', cast(c_custkey AS VARCHAR), '@Example.COM ')
       WHEN 2 THEN '' WHEN 3 THEN 'n/a'
       WHEN 4 THEN concat('user', cast(c_custkey AS VARCHAR), '.example.com')
       WHEN 5 THEN 'user@@example.com'
       WHEN 6 THEN concat('user', cast(c_custkey AS VARCHAR), '@example.zzz')
       ELSE concat('ops', cast(c_custkey AS VARCHAR), '@data.org') END"""
  val emailCodeSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 4
       WHEN 4 THEN 3 WHEN 5 THEN 3 WHEN 6 THEN 5 ELSE 1 END"""
  val emailNormSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN concat('user', cast(c_custkey AS VARCHAR), '@example.com')
       WHEN 1 THEN concat('user', cast(c_custkey AS VARCHAR), '@example.com')
       WHEN 2 THEN '' WHEN 3 THEN ''
       WHEN 4 THEN concat('user', cast(c_custkey AS VARCHAR), '.example.com')
       WHEN 5 THEN 'user@@example.com'
       WHEN 6 THEN concat('user', cast(c_custkey AS VARCHAR), '@example.zzz')
       ELSE concat('ops', cast(c_custkey AS VARCHAR), '@data.org') END"""

  // -------- url (covers codes 1,2,3,4,5) --------
  // m=0 https://example.com/item/<k>       -> 1
  // m=1 example.com/item/<k> (no scheme)   -> 2 (norm prepends https://)
  // m=2 HTTPS://Example.COM/Item/<k>       -> 2 (norm lowered)
  // m=3 'none'                             -> 4
  // m=4 htp://example.com/<k> (bad scheme) -> 3
  // m=5 https://example.zzz/<k>            -> 5 (unknown TLD)
  // m=6 ''                                 -> 4
  // m=7 https://shop.example.co/cart?id=<k> -> 1
  def url: Column = {
    val m = k % 8
    when(m === 0, concat(lit("https://example.com/item/"), k.cast("string")))
      .when(m === 1, concat(lit("example.com/item/"), k.cast("string")))
      .when(m === 2, concat(lit("HTTPS://Example.COM/Item/"), k.cast("string")))
      .when(m === 3, lit("none"))
      .when(m === 4, concat(lit("htp://example.com/"), k.cast("string")))
      .when(m === 5, concat(lit("https://example.zzz/"), k.cast("string")))
      .when(m === 6, lit(""))
      .otherwise(concat(lit("https://shop.example.co/cart?id="), k.cast("string")))
  }
  val urlSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN concat('https://example.com/item/', cast(c_custkey AS VARCHAR))
       WHEN 1 THEN concat('example.com/item/', cast(c_custkey AS VARCHAR))
       WHEN 2 THEN concat('HTTPS://Example.COM/Item/', cast(c_custkey AS VARCHAR))
       WHEN 3 THEN 'none'
       WHEN 4 THEN concat('htp://example.com/', cast(c_custkey AS VARCHAR))
       WHEN 5 THEN concat('https://example.zzz/', cast(c_custkey AS VARCHAR))
       WHEN 6 THEN ''
       ELSE concat('https://shop.example.co/cart?id=', cast(c_custkey AS VARCHAR)) END"""
  val urlCodeSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 4
       WHEN 4 THEN 3 WHEN 5 THEN 5 WHEN 6 THEN 4 ELSE 1 END"""
  val urlNormSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN concat('https://example.com/item/', cast(c_custkey AS VARCHAR))
       WHEN 1 THEN concat('https://example.com/item/', cast(c_custkey AS VARCHAR))
       WHEN 2 THEN concat('https://example.com/item/', cast(c_custkey AS VARCHAR))
       WHEN 3 THEN ''
       WHEN 4 THEN concat('htp://example.com/', cast(c_custkey AS VARCHAR))
       WHEN 5 THEN concat('https://example.zzz/', cast(c_custkey AS VARCHAR))
       WHEN 6 THEN ''
       ELSE concat('https://shop.example.co/cart?id=', cast(c_custkey AS VARCHAR)) END"""

  // -------- ISO date (covers codes 1,2,3,4,5) --------
  // m=0 2020-01-01 + (k%366) days, extended ISO -> 1
  // m=1 mm/dd/2021 from k (always a real date)  -> 2 (norm ISO)
  // m=2 '2021-13-40' (month 13)                 -> 5
  // m=3 ''                                      -> 4
  // m=4 'yesterday'                             -> 3
  // m=5 '2021-02-29' (2021 not leap)            -> 5
  // m=6 '20210412' basic ISO                    -> 2 (norm dashes)
  // m=7 '1999-12-31'                            -> 1
  def isodate: Column = {
    val m = k % 8
    val iso0 = date_format(
      date_add(to_date(lit("2020-01-01")), (k % 366).cast("int")), "yyyy-MM-dd")
    val mm = lpad(((k % 12) + 1).cast("string"), 2, "0")
    val dd = lpad(((k % 28) + 1).cast("string"), 2, "0")
    when(m === 0, iso0)
      .when(m === 1, concat(mm, lit("/"), dd, lit("/2021")))
      .when(m === 2, lit("2021-13-40"))
      .when(m === 3, lit(""))
      .when(m === 4, lit("yesterday"))
      .when(m === 5, lit("2021-02-29"))
      .when(m === 6, lit("20210412"))
      .otherwise(lit("1999-12-31"))
  }
  private val isoDaySql = "strftime(DATE '2020-01-01' + INTERVAL (c_custkey % 366) DAY, '%Y-%m-%d')"
  private val mmSql = "lpad(cast((c_custkey % 12) + 1 AS VARCHAR), 2, '0')"
  private val ddSql = "lpad(cast((c_custkey % 28) + 1 AS VARCHAR), 2, '0')"
  val isodateSql: String =
    s"""CASE c_custkey % 8
       WHEN 0 THEN $isoDaySql
       WHEN 1 THEN concat($mmSql, '/', $ddSql, '/2021')
       WHEN 2 THEN '2021-13-40' WHEN 3 THEN ''
       WHEN 4 THEN 'yesterday' WHEN 5 THEN '2021-02-29'
       WHEN 6 THEN '20210412' ELSE '1999-12-31' END"""
  val isodateCodeSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 5 WHEN 3 THEN 4
       WHEN 4 THEN 3 WHEN 5 THEN 5 WHEN 6 THEN 2 ELSE 1 END"""
  val isodateNormSql: String =
    s"""CASE c_custkey % 8
       WHEN 0 THEN $isoDaySql
       WHEN 1 THEN concat('2021-', $mmSql, '-', $ddSql)
       WHEN 2 THEN '2021-13-40' WHEN 3 THEN ''
       WHEN 4 THEN 'yesterday' WHEN 5 THEN '2021-02-29'
       WHEN 6 THEN '2021-04-12' ELSE '1999-12-31' END"""

  // -------- ipv4 (covers codes 1,2,3,4,5) --------
  // m=0 10.0.<k%256>.<k%200>          -> 1
  // m=1 ' 10.0.0.1 ' (padded)         -> 2 (norm trimmed canonical)
  // m=2 010.001.002.<k%10, 3-padded>  -> 2 (leading zeros stripped)
  // m=3 999.1.1.1                     -> 5 (octet > 255)
  // m=4 'n/a'                         -> 4
  // m=5 ''                            -> 4
  // m=6 10.0.<k%100> (3 octets)       -> 3
  // m=7 192.168.<k%256>.<k%100>       -> 1
  def ipv4: Column = {
    val m = k % 8
    when(m === 0, concat(lit("10.0."), (k % 256).cast("string"),
        lit("."), (k % 200).cast("string")))
      .when(m === 1, lit(" 10.0.0.1 "))
      .when(m === 2, concat(lit("010.001.002."),
        lpad((k % 10).cast("string"), 3, "0")))
      .when(m === 3, lit("999.1.1.1"))
      .when(m === 4, lit("n/a"))
      .when(m === 5, lit(""))
      .when(m === 6, concat(lit("10.0."), (k % 100).cast("string")))
      .otherwise(concat(lit("192.168."), (k % 256).cast("string"),
        lit("."), (k % 100).cast("string")))
  }
  val ipv4Sql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN concat('10.0.', cast(c_custkey % 256 AS VARCHAR), '.',
         cast(c_custkey % 200 AS VARCHAR))
       WHEN 1 THEN ' 10.0.0.1 '
       WHEN 2 THEN concat('010.001.002.',
         lpad(cast(c_custkey % 10 AS VARCHAR), 3, '0'))
       WHEN 3 THEN '999.1.1.1' WHEN 4 THEN 'n/a' WHEN 5 THEN ''
       WHEN 6 THEN concat('10.0.', cast(c_custkey % 100 AS VARCHAR))
       ELSE concat('192.168.', cast(c_custkey % 256 AS VARCHAR), '.',
         cast(c_custkey % 100 AS VARCHAR)) END"""
  val ipv4CodeSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 5
       WHEN 4 THEN 4 WHEN 5 THEN 4 WHEN 6 THEN 3 ELSE 1 END"""
  val ipv4NormSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN concat('10.0.', cast(c_custkey % 256 AS VARCHAR), '.',
         cast(c_custkey % 200 AS VARCHAR))
       WHEN 1 THEN '10.0.0.1'
       WHEN 2 THEN concat('10.1.2.', cast(c_custkey % 10 AS VARCHAR))
       WHEN 3 THEN '999.1.1.1' WHEN 4 THEN '' WHEN 5 THEN ''
       WHEN 6 THEN concat('10.0.', cast(c_custkey % 100 AS VARCHAR))
       ELSE concat('192.168.', cast(c_custkey % 256 AS VARCHAR), '.',
         cast(c_custkey % 100 AS VARCHAR)) END"""

  // -------- money (covers codes 1,2,3,4,5) --------
  // m=0 $<10+k%90>.25                  -> 1
  // m=1 ' $<10+k%90>.25 ' (padded)     -> 2 (norm trimmed)
  // m=2 $1,234.50                      -> 2 (norm '$1234.50')
  // m=3 <10+k%90>.75 (no $)            -> 2 (norm '$<>.75')
  // m=4 $12.3 (one decimal)            -> 5
  // m=5 'free'                         -> 3
  // m=6 'n/a'                          -> 4
  // m=7 $0.99                          -> 1
  def money: Column = {
    val m = k % 8
    val amt = ((k % 90) + 10).cast("string")
    when(m === 0, concat(lit("$"), amt, lit(".25")))
      .when(m === 1, concat(lit(" $"), amt, lit(".25 ")))
      .when(m === 2, lit("$1,234.50"))
      .when(m === 3, concat(amt, lit(".75")))
      .when(m === 4, lit("$12.3"))
      .when(m === 5, lit("free"))
      .when(m === 6, lit("n/a"))
      .otherwise(lit("$0.99"))
  }
  private val amtSql = "cast((c_custkey % 90) + 10 AS VARCHAR)"
  val moneySql: String =
    s"""CASE c_custkey % 8
       WHEN 0 THEN concat('$$', $amtSql, '.25')
       WHEN 1 THEN concat(' $$', $amtSql, '.25 ')
       WHEN 2 THEN '$$1,234.50'
       WHEN 3 THEN concat($amtSql, '.75')
       WHEN 4 THEN '$$12.3' WHEN 5 THEN 'free' WHEN 6 THEN 'n/a'
       ELSE '$$0.99' END"""
  val moneyCodeSql: String =
    """CASE c_custkey % 8
       WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 2
       WHEN 4 THEN 5 WHEN 5 THEN 3 WHEN 6 THEN 4 ELSE 1 END"""
  val moneyNormSql: String =
    s"""CASE c_custkey % 8
       WHEN 0 THEN concat('$$', $amtSql, '.25')
       WHEN 1 THEN concat('$$', $amtSql, '.25')
       WHEN 2 THEN '$$1234.50'
       WHEN 3 THEN concat('$$', $amtSql, '.75')
       WHEN 4 THEN '$$12.3' WHEN 5 THEN 'free' WHEN 6 THEN ''
       ELSE '$$0.99' END"""

  // -------- uuid (registry-defined type, covers codes 1,2,4,5) --------
  // Deliberately NOT md5-based (q285 uses md5): the hex body is built
  // from lpad(hex(k)) + letter-only filler so the DIGIT count stays far
  // below every built-in's digit-run trigger (phone 10, zip 5/9,
  // lat/long numeric) — a uuid column in a golden fixture must detect
  // as uuid and NOTHING else, and that silence must be provable from
  // the residues. Keys must stay < 16^8 (hex ≤ 8 chars) so lpad never
  // truncates; fixture ids are 0..95.
  // m=0: canonical lowercase 8-4-4-4-12            -> 1
  // m=1: canonical UPPERCASE                       -> 1 (norm lowers)
  // m=2: bare 32-hex                               -> 2 (norm dashes)
  // m=3: 'N/A'                                     -> 4
  // m=4: 'hello'                                   -> 5
  // m=5: 8-hex fragment                            -> 5
  private def hx8: Column = lpad(lower(hex(k)), 8, "0")
  private val hx8Sql = "lpad(lower(to_hex(c_custkey)), 8, '0')"
  private def uuidCanon: Column =
    concat(hx8, lit("-face-deaf-beef-cafebeefface"))
  private val uuidCanonSql =
    s"concat($hx8Sql, '-face-deaf-beef-cafebeefface')"
  def uuidHex: Column = {
    val m = k % 6
    when(m === 0, uuidCanon)
      .when(m === 1, upper(uuidCanon))
      .when(m === 2, concat(hx8, lit("facedeafbeefcafebeefface")))
      .when(m === 3, lit("N/A"))
      .when(m === 4, lit("hello"))
      .otherwise(lit("beefcafe"))
  }
  val uuidHexSql: String =
    s"""CASE c_custkey % 6
       WHEN 0 THEN $uuidCanonSql
       WHEN 1 THEN upper($uuidCanonSql)
       WHEN 2 THEN concat($hx8Sql, 'facedeafbeefcafebeefface')
       WHEN 3 THEN 'N/A'
       WHEN 4 THEN 'hello'
       ELSE 'beefcafe' END"""
  val uuidHexCodeSql: String =
    """CASE c_custkey % 6
       WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2
       WHEN 3 THEN 4 ELSE 5 END"""
  val uuidHexNormSql: String =
    s"""CASE c_custkey % 6
       WHEN 0 THEN $uuidCanonSql
       WHEN 1 THEN $uuidCanonSql
       WHEN 2 THEN $uuidCanonSql
       WHEN 3 THEN ''
       WHEN 4 THEN 'hello'
       ELSE 'beefcafe' END"""
}
