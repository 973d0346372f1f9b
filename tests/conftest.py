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


TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def _connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture()
def duck():
    con = _connect(SF_SMALL)
    yield con
    con.close()


@pytest.fixture()
def duck_mid():
    con = _connect(SF_MID)
    yield con
    con.close()
