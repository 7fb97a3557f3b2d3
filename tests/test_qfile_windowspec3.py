"""clientpositive `.q` slice, round 8: windowing_windowspec3.q — the
typed RANGE frame matrix (reference:
ql/src/test/queries/clientpositive/windowing_windowspec3.q; emp
fixture shape). Hive RANGE bounds over DATE count DAYS and over
TIMESTAMP count SECONDS (ValueBoundaryScanner); the engine's
_rewrite_range_frame_bounds retry supplies the intervals Spark needs.
DOUBLE and DECIMAL order keys take plain numeric bounds in both
engines. DuckDB oracle spells the date/timestamp bounds as INTERVALs
directly."""

from __future__ import annotations

import datetime

import duckdb
import pytest

from hive_2_3_2_spark.engine import Engine

from tests.conftest import assert_matches_oracle

EMP = []
for i in range(40):
    EMP.append((
        1000 + i,
        datetime.date(2015, 1, 1) + datetime.timedelta(days=(i * 17) % 200),
        datetime.datetime(2015, 1, 1, 8, 0, 0)
        + datetime.timedelta(seconds=(i * 900_000) % 20_000_000),
        float(3000 + (i * 250) % 4000),
        float((i * 100) % 500),
        i % 3,
    ))
SCHEMA = ("empno int, hiredate date, hirets timestamp, salary double, "
          "bonus double, deptno int")


@pytest.fixture(scope="module")
def qenv(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("qfile_ws3")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    p = str(root / "ws3_emp")
    spark.createDataFrame(EMP, SCHEMA).coalesce(1).write.parquet(p)
    eng.register_table("ws3_emp", p)
    con.execute(
        f"CREATE VIEW ws3_emp AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    yield eng, con
    con.close()


def _chk(eng, con, hive_sql, duck_sql):
    assert_matches_oracle(eng.sql(hive_sql), con, duck_sql)


def test_q_range_frames_over_date(qenv):
    """RANGE N PRECEDING over a DATE order key = N DAYS."""
    eng, con = qenv
    hive_frames = [
        "range 90 preceding",
        "range between 90 preceding and 90 following",
        "range between 90 preceding and 10 preceding",
        "range between 10 following and 90 following",
        "range between 10 following and unbounded following",
        "range between unbounded preceding and 10 following",
    ]
    duck_frames = [
        "range between interval 90 day preceding and current row",
        "range between interval 90 day preceding and interval 90 day "
        "following",
        "range between interval 90 day preceding and interval 10 day "
        "preceding",
        "range between interval 10 day following and interval 90 day "
        "following",
        "range between interval 10 day following and unbounded following",
        "range between unbounded preceding and interval 10 day following",
    ]
    for hf, df_ in zip(hive_frames, duck_frames):
        _chk(
            eng, con,
            "SELECT deptno, empno, hiredate, salary, round(sum(salary) "
            f"over (partition by deptno order by hiredate {hf}), 2) AS "
            "s FROM ws3_emp ORDER BY deptno, empno",
            "SELECT deptno, empno, hiredate, salary, round(sum(salary) "
            f"over (partition by deptno order by hiredate {df_}), 2) "
            "AS s FROM ws3_emp ORDER BY deptno, empno",
        )


def test_q_range_frames_over_timestamp(qenv):
    """RANGE N PRECEDING over a TIMESTAMP order key = N SECONDS."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT deptno, empno, salary, round(sum(salary) over "
        "(partition by deptno order by hirets range 7776000 "
        "preceding), 2) AS s FROM ws3_emp ORDER BY deptno, empno",
        "SELECT deptno, empno, salary, round(sum(salary) over "
        "(partition by deptno order by hirets range between interval "
        "7776000 second preceding and current row), 2) AS s FROM "
        "ws3_emp ORDER BY deptno, empno",
    )
    _chk(
        eng, con,
        "SELECT deptno, empno, salary, round(sum(salary) over "
        "(partition by deptno order by hirets range between 7776000 "
        "preceding and 864000 preceding), 2) AS s FROM ws3_emp "
        "ORDER BY deptno, empno",
        "SELECT deptno, empno, salary, round(sum(salary) over "
        "(partition by deptno order by hirets range between interval "
        "7776000 second preceding and interval 864000 second "
        "preceding), 2) AS s FROM ws3_emp ORDER BY deptno, empno",
    )


def test_q_range_frames_over_numeric(qenv):
    """Numeric (DOUBLE) order keys take plain value bounds, including
    frames entirely before/after the current row."""
    eng, con = qenv
    for frame in (
        "range 200 preceding",
        "range between 200 preceding and 200 following",
        "range between 200 preceding and 100 preceding",
        "range between 100 following and 200 following",
        "range between 200 following and unbounded following",
        "range between unbounded preceding and 200 following",
    ):
        duck_frame = (
            frame
            if "between" in frame
            else "range between 200 preceding and current row"
        )
        _chk(
            eng, con,
            "SELECT deptno, empno, bonus, round(avg(bonus) over "
            f"(partition by deptno order by bonus {frame}), 4) AS a "
            "FROM ws3_emp ORDER BY deptno, empno",
            "SELECT deptno, empno, bonus, round(avg(bonus) over "
            f"(partition by deptno order by bonus {duck_frame}), 4) "
            "AS a FROM ws3_emp ORDER BY deptno, empno",
        )


def test_q_range_current_row_to_unbounded_over_timestamp(qenv):
    """The file's head shape: partition BY the timestamp itself with
    current-row→unbounded range."""
    eng, con = qenv
    _chk(
        eng, con,
        "SELECT hirets, salary, round(sum(salary) over (partition by "
        "hirets range between current row and unbounded following), 2) "
        "AS s FROM ws3_emp ORDER BY hirets, salary",
        "SELECT hirets, salary, round(sum(salary) over (partition by "
        "hirets range between current row and unbounded following), 2) "
        "AS s FROM ws3_emp ORDER BY hirets, salary",
    )
