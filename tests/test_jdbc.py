"""JDBC source/sink parity (SURVEY S10 scan / K5 insert — the reference's
MySQL path, Utils/sql.py:24-43) exercised against embedded Derby, the only
SQL engine whose JDBC driver ships inside the PySpark distribution.

The point is not Derby: it is that ``spark.read/write.format("jdbc")``
round-trips schema + values through a real SQL database, including the
partitioned parallel read that a 100 TB deployment needs.
"""

import os

import pytest

from league_of_legends_data_pipeline_spark.sinks import (
    jdbc_evolve_append, jdbc_read, jdbc_write,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_url(tmp_path, name):
    return f"jdbc:derby:{os.path.join(str(tmp_path), name)};create=true"


@pytest.fixture(scope="module")
def derby_home(tmp_path_factory):
    # derby.log lands in user.dir otherwise; keep it out of the repo
    return tmp_path_factory.mktemp("derby")


def test_jdbc_roundtrip(spark, derby_home):
    url = _derby_url(derby_home, "rt")
    src = spark.createDataFrame(
        [(1, "NATION_1", 1.5), (2, "NATION_2", -3.25), (3, None, 0.0)],
        "id int, name string, score double",
    )
    jdbc_write(src, url, "roundtrip", driver=DERBY_DRIVER)
    back = jdbc_read(spark, url, "roundtrip", driver=DERBY_DRIVER)
    assert sorted(back.columns) == sorted(c.upper() for c in src.columns) or \
        sorted(c.lower() for c in back.columns) == sorted(src.columns)
    got = sorted((r[0], r[1], r[2]) for r in
                 back.select(*[c for c in back.columns]).collect())
    assert got == [(1, "NATION_1", 1.5), (2, "NATION_2", -3.25), (3, None, 0.0)]


def test_jdbc_overwrite_and_append(spark, derby_home):
    url = _derby_url(derby_home, "modes")
    df = spark.range(5).withColumnRenamed("id", "k")
    jdbc_write(df, url, "modes", driver=DERBY_DRIVER)
    jdbc_write(df, url, "modes", mode="append", driver=DERBY_DRIVER)
    assert jdbc_read(spark, url, "modes", driver=DERBY_DRIVER).count() == 10
    jdbc_write(df, url, "modes", mode="overwrite", driver=DERBY_DRIVER)
    assert jdbc_read(spark, url, "modes", driver=DERBY_DRIVER).count() == 5


def test_jdbc_partitioned_parallel_read(spark, derby_home):
    url = _derby_url(derby_home, "par")
    n = 1000
    src = spark.range(n).withColumnRenamed("id", "k") \
        .selectExpr("k", "k * 2 AS v")
    jdbc_write(src, url, "par", driver=DERBY_DRIVER)
    # bounds auto-discovered from min/max when omitted
    back = jdbc_read(spark, url, "par", driver=DERBY_DRIVER,
                     partition_column="k", num_partitions=4)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == n
    assert back.agg({"v": "sum"}).first()[0] == sum(2 * i for i in range(n))


def test_jdbc_evolve_append_adds_columns(spark, derby_home):
    """K5 JDBC parity (Utils/sql.py:24-43): appending a frame with an
    unseen column ALTERs it in; both column sets survive round-trip with
    null-padding in both directions."""
    url = _derby_url(derby_home, "evolve")
    first = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, name string")
    jdbc_evolve_append(spark, first, url, "evolve", driver=DERBY_DRIVER)

    # second batch: new column `score`, and drops `name`
    second = spark.createDataFrame(
        [(3, 1.5), (4, -2.0)], "id int, score double")
    jdbc_evolve_append(spark, second, url, "evolve", driver=DERBY_DRIVER)

    back = jdbc_read(spark, url, "evolve", driver=DERBY_DRIVER)
    cols = {c.lower() for c in back.columns}
    assert cols == {"id", "name", "score"}
    rows = {tuple(r) for r in
            back.select(*sorted(back.columns, key=str.lower)).collect()}
    assert rows == {(1, "a", None), (2, "b", None),
                    (3, None, 1.5), (4, None, -2.0)}

    # idempotent shape: re-appending an already-aligned frame evolves nothing
    third = spark.createDataFrame([(5, "c", 9.0)],
                                  "id int, name string, score double")
    jdbc_evolve_append(spark, third, url, "evolve", driver=DERBY_DRIVER)
    assert jdbc_read(spark, url, "evolve", driver=DERBY_DRIVER).count() == 5


def test_jdbc_read_empty_partitioned_raises(spark, derby_home):
    """Auto-partitioned read of an empty table must fail with a clear
    error, not hand str(None) to Spark (ADVICE r3)."""
    url = _derby_url(derby_home, "emptyp")
    spark.createDataFrame([], "k int, v int") \
        .write.format("jdbc").options(
            url=url, dbtable="emptyp", driver=DERBY_DRIVER).save()
    with pytest.raises(ValueError, match="MIN/MAX"):
        jdbc_read(spark, url, "emptyp", driver=DERBY_DRIVER,
                  partition_column="k")


def test_jdbc_sink_parity_with_table(spark, sf_dir, derby_home):
    """The reference inserts flattened match rows into MySQL; parity = a
    driver-generated table surviving the JDBC round-trip value-exact."""
    from league_of_legends_data_pipeline_spark.session import load_tables

    url = _derby_url(derby_home, "nation")
    nation = load_tables(spark, sf_dir, ["nation"])["nation"]
    jdbc_write(nation, url, "nation", driver=DERBY_DRIVER)
    back = jdbc_read(spark, url, "nation", driver=DERBY_DRIVER)
    assert back.count() == nation.count()
    a = sorted(tuple(r) for r in nation.collect())
    b = sorted(tuple(r) for r in
               back.select(*[c.lower() for c in back.columns]).collect())
    assert a == b


def test_jdbc_evolve_append_widens_drifting_types(spark, derby_home):
    """K5 drifting-type batches (reference Utils/sql.py:49-52 promotes
    INT->BIGINT on overflow): a column arriving with a strictly wider
    type widens the target column in place (values preserved), a
    narrower batch up-casts frame-side into the widened column, and an
    incompatible drift rejects loudly."""
    url = _derby_url(derby_home, "widen")
    b1 = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    jdbc_evolve_append(spark, b1, url, "widen", driver=DERBY_DRIVER)
    # wider batch: int -> bigint, with a value that cannot fit in INT
    b2 = spark.createDataFrame([(3, 5_000_000_000)], "k int, v bigint")
    jdbc_evolve_append(spark, b2, url, "widen", driver=DERBY_DRIVER)
    back = jdbc_read(spark, url, "widen", driver=DERBY_DRIVER)
    vt = {f.name.lower(): f.dataType.simpleString()
          for f in back.schema.fields}
    assert vt["v"] == "bigint"
    assert sorted((r["K"] if "K" in r else r["k"], r["V"] if "V" in r else r["v"])
                  for r in back.collect()) == \
        [(1, 10), (2, 20), (3, 5_000_000_000)]
    # narrower batch into the widened column: up-cast frame-side, no DDL
    b3 = spark.createDataFrame([(4, 40)], "k int, v int")
    jdbc_evolve_append(spark, b3, url, "widen", driver=DERBY_DRIVER)
    assert jdbc_read(spark, url, "widen", driver=DERBY_DRIVER).count() == 4
    # int -> double widening (the other lattice edge)
    b4 = spark.createDataFrame([(5, 50_000_000_000, 0.5)],
                               "k int, v bigint, q double")
    jdbc_evolve_append(spark, b4, url, "widen", driver=DERBY_DRIVER)
    b5 = spark.createDataFrame([(6, 1, 2)], "k int, v int, q int")
    jdbc_evolve_append(spark, b5, url, "widen", driver=DERBY_DRIVER)
    back2 = jdbc_read(spark, url, "widen", driver=DERBY_DRIVER)
    vt2 = {f.name.lower(): f.dataType.simpleString()
           for f in back2.schema.fields}
    assert vt2["q"] == "double" and back2.count() == 6
    # incompatible drift: string into a numeric column -> loud reject
    bad = spark.createDataFrame([(7, "oops")], "k int, v string")
    with pytest.raises(ValueError, match="not a lossless widening"):
        jdbc_evolve_append(spark, bad, url, "widen", driver=DERBY_DRIVER)


def test_widen_rollback_failure_does_not_mask_derby_spelling():
    """Round-7 ADVICE: if rollback-to-savepoint itself fails (engine
    invalidated the savepoint via an implicit DDL commit), the Derby
    RENAME spelling must still be attempted instead of the rollback
    error masking the original failure. Duck-typed JDBC fakes — the
    function only touches conn/stmt through their JDBC methods."""
    from league_of_legends_data_pipeline_spark.sinks import _jdbc_widen_column

    executed = []

    class FakeStmt:
        def executeUpdate(self, sql):
            executed.append(sql)
            if "ALTER COLUMN" in sql or " MODIFY " in sql:
                raise RuntimeError("in-place widen unsupported")
            if sql.startswith("ALTER TABLE") and "RENAME COLUMN" in sql:
                raise RuntimeError("standard RENAME unsupported")
            return 1  # ADD / UPDATE / DROP / Derby RENAME succeed

    class FakeConn:
        committed = False
        full_rollback = False

        def setAutoCommit(self, v):
            pass

        def setSavepoint(self):
            return object()

        def releaseSavepoint(self, sp):
            pass

        def rollback(self, sp=None):
            if sp is not None:  # rollback-to-savepoint: engine killed it
                raise RuntimeError("savepoint no longer exists")
            self.full_rollback = True

        def commit(self):
            self.committed = True

    conn = FakeConn()
    _jdbc_widen_column(conn, FakeStmt(), "T", "v", "BIGINT")
    # the Derby spelling ran and the widen committed — the rollback
    # failure neither masked the path nor aborted the dance
    assert any(s.startswith("RENAME COLUMN T.") for s in executed)
    assert conn.committed and not conn.full_rollback
