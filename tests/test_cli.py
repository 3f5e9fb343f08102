"""CLI runner: query registry listing and a named-query run (the
`hadoop jar` driver-program analog, `EXAMPLES/ExampleDriver.java:29`)."""

from __future__ import annotations

from hadoop_spark import cli
from tests.conftest import SF_DIR


def test_cli_list(capsys):
    assert cli.main(["--list"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "wordcount" in out and "tpch_q1" in out


def test_cli_unknown_query():
    assert cli.main(["definitely_not_a_query"]) == 2


def test_cli_runs_named_query(spark, capsys):
    # reuses the session via getOrCreate inside get_session
    assert cli.main(["wordcount", "--sf-dir", SF_DIR, "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "word" in out


def test_cli_explain(spark, capsys):
    assert cli.main(["tpch_q6", "--sf-dir", SF_DIR, "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
