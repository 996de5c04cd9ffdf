"""LIVE PostgreSQL validation of the S12 upsert dialect.

The reference keeps Postgres mirrors updated with per-row
INSERT ... ON CONFLICT (reference consumer/spark-streaming/
database.py:161-196); this engine ships the same semantics SET-BASED
(sources.py:upsert_statements). Until round 5 those statements were
executed only against DuckDB's ON CONFLICT implementation; this module
runs them against a REAL PostgreSQL 15 server (initdb + unix socket,
no network), closing most of the S12 "env-blocked" caveat — what
remains blocked is only the JDBC transport (no postgres JDBC jar in
the Spark runtime), which jdbc_read/jdbc_write/jdbc_execute wrap
thinly.

The server runs as the 'postgres' system user (postgres refuses root)
on a private data dir + socket under /tmp; everything is torn down at
module end. Skips cleanly where the binaries or user are unavailable.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import pytest

from deltalake_poc_spark.sources import upsert_statements

PG_BIN = "/usr/lib/postgresql/15/bin"


def _have_postgres() -> bool:
    if not os.path.exists(os.path.join(PG_BIN, "initdb")):
        return False
    try:
        out = subprocess.run(["su", "postgres", "-c", "true"],
                             cwd="/tmp", capture_output=True, timeout=10)
        return out.returncode == 0
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _have_postgres(), reason="no local postgres server binaries")


class _Pg:
    def __init__(self):
        self.root = tempfile.mkdtemp(prefix="pglive_")
        self.data = os.path.join(self.root, "data")
        self.sock = os.path.join(self.root, "sock")
        os.makedirs(self.data)
        os.makedirs(self.sock)
        subprocess.run(["chown", "-R", "postgres", self.root], check=True)
        self._su(f"{PG_BIN}/initdb -D {self.data} -A trust")
        # wal_level=logical so test_decoding replication slots work
        # (the WAL-CDC adapter test); timezone pinned UTC to match the
        # adapter's timestamp decoding
        self._su(
            f"{PG_BIN}/pg_ctl -D {self.data} "
            f"-o \"-k {self.sock} -c listen_addresses='' "
            f"-c wal_level=logical -c max_replication_slots=4 "
            f"-c max_wal_senders=4 -c timezone=UTC\" "
            f"-l {self.root}/log start")

    def _su(self, cmd: str) -> str:
        r = subprocess.run(["su", "postgres", "-c", cmd], cwd="/tmp",
                           capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, f"{cmd}\n{r.stdout}\n{r.stderr}"
        return r.stdout

    def sql(self, statement: str, db: str = "postgres",
            sep: str = "|") -> str:
        """One statement through psql, tuples-only unaligned output.
        ``sep`` sets the field separator — pass a control char (e.g.
        \\x1f) when values may contain pipes."""
        path = os.path.join(self.root, "stmt.sql")
        with open(path, "w") as fh:
            fh.write(statement)
        os.chmod(path, 0o644)
        return self._su(
            f"psql -h {self.sock} -d {db} -v ON_ERROR_STOP=1 -qAt "
            f"-F $'\\x1f' -f {path}" if sep == "\x1f" else
            f"psql -h {self.sock} -d {db} -v ON_ERROR_STOP=1 -qAt -f {path}")

    def stop(self):
        try:
            self._su(f"{PG_BIN}/pg_ctl -D {self.data} -m fast stop")
        finally:
            shutil.rmtree(self.root, ignore_errors=True)


@pytest.fixture(scope="module")
def pg():
    server = _Pg()
    yield server
    server.stop()


def _setup_tables(pg: _Pg):
    """Target mirrors the staged shape (as jdbc_write creates it, CDC
    op column included) with three existing rows; the staged batch
    updates one, deletes one, inserts one."""
    pg.sql("DROP TABLE IF EXISTS public.customers;"
           "DROP TABLE IF EXISTS public.customers__staging;")
    pg.sql("""
        CREATE TABLE public.customers (
            id BIGINT PRIMARY KEY, name TEXT, email TEXT,
            __cdc_operation TEXT, __synced_at TIMESTAMP);
        INSERT INTO public.customers VALUES
            (1, 'alice', 'a@old', 'c', '2020-01-01'),
            (2, 'bob',   'b@old', 'c', '2020-01-01'),
            (3, 'carol', 'c@old', 'c', '2020-01-01');
        CREATE TABLE public.customers__staging (
            id BIGINT, name TEXT, email TEXT,
            __cdc_operation TEXT, __synced_at TIMESTAMP);
        INSERT INTO public.customers__staging VALUES
            (2, 'bobby', 'b@new', 'u', NULL),
            (3, NULL,    NULL,    'd', NULL),
            (4, 'dave',  'd@new', 'c', NULL);
    """)


def test_postgres_dialect_against_live_server(pg):
    """The generated postgres-dialect statements run UNMODIFIED on a
    real PostgreSQL 15 and produce exactly the reference's mirror
    semantics: conflict rows updated (with __synced_at bumped),
    delete-op rows removed, new rows inserted, staging dropped."""
    _setup_tables(pg)
    stmts = upsert_statements(
        ["id", "name", "email", "__cdc_operation", "__synced_at"],
        "customers", keys=("id",), dialect="postgresql")
    pg.sql(stmts["upsert"])
    pg.sql(stmts["delete"])
    pg.sql(stmts["drop_staging"])

    rows = pg.sql("SELECT id, name, email FROM public.customers "
                  "ORDER BY id").strip().splitlines()
    assert rows == ["1|alice|a@old", "2|bobby|b@new", "4|dave|d@new"]
    # updated row got a fresh __synced_at; untouched row kept its old one
    synced = pg.sql("SELECT id FROM public.customers "
                    "WHERE __synced_at > '2021-01-01' "
                    "ORDER BY id").strip().splitlines()
    assert synced == ["2", "4"]
    assert pg.sql("SELECT to_regclass('public.customers__staging') "
                  "IS NULL").strip() == "t"


def test_postgres_dialect_matches_duckdb_twin(pg):
    """Cross-engine agreement: the same staged batch applied via the
    postgres dialect on live PostgreSQL and via DuckDB's ON CONFLICT
    (the oracle twin the suite always runs) converges to identical
    target rows."""
    import duckdb

    _setup_tables(pg)
    stmts = upsert_statements(
        ["id", "name", "email", "__cdc_operation", "__synced_at"],
        "customers", keys=("id",), dialect="postgresql",
        synced_at_col=None)
    pg.sql(stmts["upsert"])
    pg.sql(stmts["delete"])
    got_pg = pg.sql("SELECT id, name, email FROM public.customers "
                    "ORDER BY id").strip().splitlines()

    con = duckdb.connect()
    con.execute("""
        CREATE TABLE customers (
            id BIGINT PRIMARY KEY, name TEXT, email TEXT,
            __cdc_operation TEXT, __synced_at TIMESTAMP);
        INSERT INTO customers VALUES
            (1, 'alice', 'a@old', 'c', '2020-01-01'),
            (2, 'bob',   'b@old', 'c', '2020-01-01'),
            (3, 'carol', 'c@old', 'c', '2020-01-01');
        CREATE TABLE customers__staging (
            id BIGINT, name TEXT, email TEXT,
            __cdc_operation TEXT, __synced_at TIMESTAMP);
        INSERT INTO customers__staging VALUES
            (2, 'bobby', 'b@new', 'u', NULL),
            (3, NULL,    NULL,    'd', NULL),
            (4, 'dave',  'd@new', 'c', NULL);
    """)
    duck_stmts = upsert_statements(
        ["id", "name", "email", "__cdc_operation", "__synced_at"],
        "customers", keys=("id",), dialect="postgresql", schema="",
        synced_at_col=None)
    con.execute(duck_stmts["upsert"])
    con.execute(duck_stmts["delete"])
    got_duck = ["|".join("" if v is None else str(v) for v in r)
                for r in con.execute(
                    "SELECT id, name, email FROM customers ORDER BY id"
                ).fetchall()]
    assert got_pg == got_duck
    assert got_pg == ["1|alice|a@old", "2|bobby|b@new", "4|dave|d@new"]


def test_wal_cdc_end_to_end(pg, spark, tmp_path):
    """REAL database commits -> versioned snapshot tables, no Debezium
    or Kafka in between: DML runs on live PostgreSQL 15, the WAL is
    decoded through a test_decoding logical replication slot, the
    adapter (cdc/pgwal.py) reshapes the lines into Debezium-envelope
    Kafka records, and the engine's UNCHANGED parse_debezium +
    CDCApplier path applies them. The snapshot table must converge to
    exactly the live table's rows — including an in-transaction
    update chain, a NULLed column, and a delete."""
    from deltalake_poc_spark.cdc import CDCApplier
    from deltalake_poc_spark.cdc.parse import parse_debezium
    from deltalake_poc_spark.cdc.pgwal import (kafka_shape_df,
                                               wal_to_kafka_messages)

    pg.sql("DROP TABLE IF EXISTS public.wal_customers;")
    pg.sql("""
        CREATE TABLE public.wal_customers (
            id BIGINT PRIMARY KEY, first_name TEXT, email TEXT,
            balance DOUBLE PRECISION, vip BOOLEAN,
            created_at TIMESTAMP);
        SELECT pg_create_logical_replication_slot(
            'graft_slot', 'test_decoding');
    """)
    pg.sql("""
        INSERT INTO public.wal_customers VALUES
            (1, 'alice', 'a@x', 10.5, true,  '2024-01-01 10:00:00'),
            (2, 'bob',   'b@x', 0.25, false, '2024-01-02 11:30:00'),
            (3, 'carol', 'c@x', 7.0,  true,  '2024-01-03 12:00:00');
    """)
    # separate transactions: an update chain on one key (latest must
    # win), a NULL assignment, and a delete
    pg.sql("UPDATE public.wal_customers SET email='b@new1' WHERE id=2;")
    pg.sql("UPDATE public.wal_customers "
           "SET email='b@new2', vip=NULL WHERE id=2;")
    pg.sql("DELETE FROM public.wal_customers WHERE id=3;")

    raw = pg.sql("SELECT lsn::text, xid::text, data FROM "
                 "pg_logical_slot_get_changes('graft_slot', NULL, NULL);",
                 sep="\x1f")
    changes = [line.split("\x1f", 2) for line in raw.splitlines() if line]
    msgs = wal_to_kafka_messages(changes, source_name="pgwal",
                                 db="postgres")
    # 3 inserts + 2 updates + 1 delete; BEGIN/COMMIT rows dropped
    assert len(msgs) == 6

    events = parse_debezium(kafka_shape_df(spark, msgs))
    got_ops = [r["operation"] for r in
               events.orderBy("offset").collect()]
    assert got_ops == ["c", "c", "c", "u", "u", "d"]

    applier = CDCApplier(spark, str(tmp_path / "cdc"),
                         infer_unknown_tables=True)
    metrics = applier.apply_batch(events, batch_id="wal-b1")
    assert "wal_customers" in metrics

    snap = {r["id"]: r for r in
            applier.snapshot_table("wal_customers").read().collect()}
    live = {}
    for line in pg.sql(
            "SELECT id, first_name, email, balance, vip, "
            "CAST(EXTRACT(EPOCH FROM created_at) * 1000000 AS BIGINT) "
            "FROM public.wal_customers ORDER BY id",
            sep="\x1f").splitlines():
        f = line.split("\x1f")
        live[int(f[0])] = f
    assert set(snap) == set(live) == {1, 2}
    for i in sorted(live):
        r, f = snap[i], live[i]
        assert r["first_name"] == f[1] and r["email"] == f[2]
        assert abs(r["balance"] - float(f[3])) < 1e-9
        assert r["vip"] == ({"t": True, "f": False}.get(f[4]) or None)
        # epoch-µs payload was re-typed to a real timestamp (F5)
        import datetime as _dt
        got_us = int(r["created_at"].replace(
            tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
        assert got_us == int(f[5])
    # the update chain resolved to the LAST commit (lsn order)
    assert snap[2]["email"] == "b@new2" and snap[2]["vip"] is None
    pg.sql("SELECT pg_drop_replication_slot('graft_slot');")


def test_wal_cdc_to_standard_delta_mirror(pg, spark, tmp_path):
    """Full modern-stack hop: live PostgreSQL commits -> WAL decode ->
    CDC apply -> STANDARD Delta mirror, verified by the engine's
    fixture-validated Delta-protocol reader. A delta-spark/delta-rs
    consumer pointed at the mirror would follow real database changes
    with no Debezium, Kafka, or Delta writer in the path."""
    from deltalake_poc_spark.cdc import CDCApplier
    from deltalake_poc_spark.cdc.parse import parse_debezium
    from deltalake_poc_spark.cdc.pgwal import (kafka_shape_df,
                                               wal_to_kafka_messages)
    from deltalake_poc_spark.tables.deltareader import DeltaLakeReader

    pg.sql("DROP TABLE IF EXISTS public.wal_mirror;")
    pg.sql("""
        CREATE TABLE public.wal_mirror (
            id BIGINT PRIMARY KEY, name TEXT, qty BIGINT);
        SELECT pg_create_logical_replication_slot(
            'graft_slot2', 'test_decoding');
    """)
    pg.sql("INSERT INTO public.wal_mirror VALUES "
           "(1,'a',10),(2,'b',20),(3,'c',30);")
    pg.sql("UPDATE public.wal_mirror SET qty = 25 WHERE id = 2;")
    pg.sql("DELETE FROM public.wal_mirror WHERE id = 1;")

    raw = pg.sql("SELECT lsn::text, xid::text, data FROM "
                 "pg_logical_slot_get_changes('graft_slot2', NULL, NULL);",
                 sep="\x1f")
    changes = [line.split("\x1f", 2) for line in raw.splitlines() if line]
    events = parse_debezium(kafka_shape_df(
        spark, wal_to_kafka_messages(changes)))

    mirror_root = str(tmp_path / "mirror")
    applier = CDCApplier(spark, str(tmp_path / "cdc"),
                         infer_unknown_tables=True,
                         standard_mirror_path=mirror_root)
    applier.apply_batch(events, batch_id="walm-1")

    got = sorted(
        (r["id"], r["name"], r["qty"]) for r in
        DeltaLakeReader(spark, f"{mirror_root}/wal_mirror")
        .read().select("id", "name", "qty").collect())
    live = sorted(
        (int(f[0]), f[1], int(f[2])) for f in
        (l.split("|") for l in pg.sql(
            "SELECT id, name, qty FROM public.wal_mirror ORDER BY id"
        ).splitlines() if l))
    assert got == live == [(2, "b", 25), (3, "c", 30)]
    pg.sql("SELECT pg_drop_replication_slot('graft_slot2');")


def test_wal_follow_peek_apply_advance_exactly_once(pg, spark, tmp_path):
    """Continuous WAL following with the peek -> apply -> advance
    protocol: a crash between apply and advance re-delivers the same
    peeked batch, and the batchId commit markers must make the replay
    a no-op (audit rows stable, snapshot unchanged); after advancing,
    the next peek starts past the applied LSN and a second DML round
    applies incrementally."""
    from deltalake_poc_spark.cdc import CDCApplier
    from deltalake_poc_spark.cdc.pgwal import apply_wal_batch

    def peek():
        raw = pg.sql(
            "SELECT lsn::text, xid::text, data FROM "
            "pg_logical_slot_peek_changes('graft_slot3', NULL, NULL);",
            sep="\x1f")
        return [l.split("\x1f", 2) for l in raw.splitlines() if l]

    pg.sql("DROP TABLE IF EXISTS public.wal_follow;")
    pg.sql("""
        CREATE TABLE public.wal_follow (
            id BIGINT PRIMARY KEY, v TEXT);
        SELECT pg_create_logical_replication_slot(
            'graft_slot3', 'test_decoding');
    """)
    applier = CDCApplier(spark, str(tmp_path / "cdc"),
                         infer_unknown_tables=True)

    pg.sql("INSERT INTO public.wal_follow VALUES (1,'a'),(2,'b');")
    batch1 = peek()
    metrics, upto = apply_wal_batch(spark, applier, batch1)
    assert upto is not None and "wal_follow" in metrics
    audit_n = applier.audit_table().read().count()
    # crash before advance: the SAME peeked batch is delivered again
    apply_wal_batch(spark, applier, peek())
    assert applier.audit_table().read().count() == audit_n, \
        "replayed WAL batch double-appended to the audit table"
    snap = applier.snapshot_table("wal_follow")
    assert sorted((r["id"], r["v"]) for r in snap.read().collect()) == \
        [(1, "a"), (2, "b")]

    pg.sql(f"SELECT pg_replication_slot_advance("
           f"'graft_slot3', '{upto}'::pg_lsn);")
    # second round applies only the new changes
    pg.sql("UPDATE public.wal_follow SET v='a2' WHERE id=1;"
           "INSERT INTO public.wal_follow VALUES (3,'c');")
    batch2 = peek()
    assert batch2, "advance consumed too much: second round invisible"
    _, upto2 = apply_wal_batch(spark, applier, batch2)
    assert upto2 != upto
    assert sorted((r["id"], r["v"]) for r in snap.read().collect()) == \
        [(1, "a2"), (2, "b"), (3, "c")]
    pg.sql("SELECT pg_drop_replication_slot('graft_slot3');")
