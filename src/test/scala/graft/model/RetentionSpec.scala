package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference retention/validator tests
  * (/root/reference/test_whisper.py:144-201,892-929).
  */
class RetentionSpec extends AnyFunSuite {

  test("parseRetentionDef: valid forms") {
    assert(Retention.parseRetentionDef("60:10") == ArchiveInfo(60, 10))
    assert(Retention.parseRetentionDef("10:60") == ArchiveInfo(10, 60))
    assert(Retention.parseRetentionDef("10s:10h") == ArchiveInfo(10, 3600))
    assert(Retention.parseRetentionDef("1h:7d") == ArchiveInfo(3600, 168))
    assert(Retention.parseRetentionDef("1m:30d") == ArchiveInfo(60, 43200))
    assert(Retention.parseRetentionDef("7d:1y") == ArchiveInfo(604800, 52))
    // prefix unit matching (whisper.py:147-151)
    assert(Retention.parseRetentionDef("10se:10h") == ArchiveInfo(10, 3600))
    assert(Retention.parseRetentionDef("1mi:30mi") == ArchiveInfo(60, 30))
  }

  test("parseRetentionDef: invalid forms raise") {
    // test_whisper.py:907-929
    intercept[IllegalArgumentException](Retention.parseRetentionDef("10"))
    intercept[IllegalArgumentException](Retention.parseRetentionDef("10x:10"))
    intercept[IllegalArgumentException](Retention.parseRetentionDef("10X:10"))
    intercept[IllegalArgumentException](Retention.parseRetentionDef("10:10$"))
    intercept[IllegalArgumentException](Retention.parseRetentionDef("60:10f"))
  }

  test("validateArchiveList: the five invariants with reference messages") {
    // empty (test_whisper.py:148-151)
    val e1 = intercept[InvalidConfiguration](Retention.validateArchiveList(Nil))
    assert(e1.getMessage == "You must specify at least one archive configuration!")

    // duplicate precision
    val e2 = intercept[InvalidConfiguration](
      Retention.validateArchiveList(Seq(ArchiveInfo(1, 60), ArchiveInfo(60, 60), ArchiveInfo(1, 60))))
    assert(e2.getMessage.contains("same precision"))

    // non-dividing precisions
    val e3 = intercept[InvalidConfiguration](
      Retention.validateArchiveList(Seq(ArchiveInfo(60, 60), ArchiveInfo(7, 60))))
    assert(e3.getMessage.contains("evenly divide"))

    // coverage
    val e4 = intercept[InvalidConfiguration](
      Retention.validateArchiveList(Seq(ArchiveInfo(1, 60), ArchiveInfo(10, 1))))
    assert(e4.getMessage.contains("cover larger time intervals"))

    // consolidation point count
    val e5 = intercept[InvalidConfiguration](
      Retention.validateArchiveList(Seq(ArchiveInfo(1, 30), ArchiveInfo(60, 60))))
    assert(e5.getMessage.contains("enough points to consolidate"))

    // valid list returns sorted by precision
    val ok = Retention.validateArchiveList(Seq(ArchiveInfo(60, 60), ArchiveInfo(1, 60)))
    assert(ok == Seq(ArchiveInfo(1, 60), ArchiveInfo(60, 60)))
  }

  test("size model matches whisper-create --estimate (README 60:1440 example)") {
    val a = Seq(ArchiveInfo(60, 1440))
    assert(Retention.estimateFileSize(a) == 17308L) // whisper-create.py:71-72
    assert(Retention.estimateDiskSize(a) == 20480L) // 5 blocks of 4 KiB
  }

  test("policy: xff stored as float32 (test_whisper.py:630-633)") {
    val p = RetentionPolicy(Seq(ArchiveInfo(1, 60)), xff = 0.2f)
    assert(p.xff.toDouble == 0.20000000298023224)
    intercept[InvalidXFilesFactor](RetentionPolicy(Seq(ArchiveInfo(1, 60)), xff = 1.5f))
  }

  test("policy: level routing by age and query age") {
    val p = RetentionPolicy(
      Seq(ArchiveInfo(1, 60), ArchiveInfo(60, 60), ArchiveInfo(3600, 24), ArchiveInfo(86400, 365)))
    assert(p.maxRetention == 86400L * 365)
    assert(p.levelForAge(30) == Some(0))
    assert(p.levelForAge(61) == Some(1))
    assert(p.levelForAge(3601) == Some(2))
    assert(p.levelForAge(86401) == Some(3))
    assert(p.levelForAge(86400L * 366) == None) // beyond total retention
    // fetch archive selection (test_whisper.py:519-553)
    assert(p.levelForQueryAge(30) == 0)
    assert(p.levelForQueryAge(3600) == 1)
    assert(p.levelForPrecision(3600) == 2)
    intercept[IllegalArgumentException](p.levelForPrecision(2))
  }

  test("header offsets mirror the create() layout") {
    val p = RetentionPolicy(Seq(ArchiveInfo(1, 60), ArchiveInfo(60, 60)))
    val rows = Header.infoRows(p)
    // 16 B metadata + 2×12 B archive infos = 40; ring 0 is 60×12 = 720
    assert(rows.map(_.offset) == Seq(40L, 760L))
  }
}
