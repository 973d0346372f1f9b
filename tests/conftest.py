import duckdb
import pytest

from stakgraph_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture()
def spark():
    # getOrCreate: reuses the active session; tests that need a
    # specific master stop it and recreate (get_spark re-creates
    # after stop).
    return get_spark(master="local[8]")


@pytest.fixture()
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_SMALL}/events.parquet'")
    yield con
    con.close()


@pytest.fixture()
def duck_mid():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_MID}/events.parquet'")
    yield con
    con.close()
