"""Tests for the interactive CLI console (`python -m sneldb_spark.cli`),
the parity surface of the reference's sneldb-cli binary: one-shot /
stdin / interactive modes, layered config resolution, HMAC auth, and
table rendering. In-process calls to cli.main() (capsys) keep these
fast; no subprocess Spark restarts."""

import os

import pytest


@pytest.fixture()
def http_server(engine):
    from sneldb_spark.http_server import SnelDBHttpServer

    server = SnelDBHttpServer(engine).start()
    yield server
    server.stop()


def _url(server) -> str:
    host, port = server.address
    return f"http://{host}:{port}"


def _seed(engine):
    engine.execute('DEFINE cliev FIELDS { "n": "int", "tag": "string" }')
    for i in range(4):
        engine.execute(
            f'STORE cliev FOR c{i} PAYLOAD {{ "n": {i}, "tag": "t{i % 2}" }}'
        )
    engine.execute("FLUSH")


def test_cli_one_shot_query(http_server, engine, capsys):
    from sneldb_spark.cli import main

    _seed(engine)
    rc = main(["-u", _url(http_server), "-q", "QUERY cliev WHERE n >= 2 RETURN [n]"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "(2 rows)" in out
    assert "n" in out.splitlines()[0]  # header row


def test_cli_one_shot_write_and_error(http_server, engine, capsys):
    from sneldb_spark.cli import main

    url = _url(http_server)
    rc = main(["-u", url, "-q", 'DEFINE cliw FIELDS { "x": "int" }'])
    assert rc == 0
    assert "Defined" in capsys.readouterr().out or rc == 0
    rc = main(["-u", url, "-q", "NOT A COMMAND"])
    err = capsys.readouterr().err
    assert rc == 1
    assert "Error" in err


def test_cli_stdin_mode(http_server, engine, capsys, monkeypatch):
    import io

    from sneldb_spark.cli import main

    _seed(engine)
    monkeypatch.setattr("sys.stdin", io.StringIO("QUERY cliev COUNT BY tag\n"))
    rc = main(["-u", _url(http_server), "--stdin"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "(2 rows)" in out


def test_cli_limit_truncates_display(http_server, engine, capsys):
    from sneldb_spark.cli import main

    _seed(engine)
    rc = main(["-u", _url(http_server), "-q", "QUERY cliev", "-l", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "(4 rows (showing 1))" in out


def test_cli_hmac_auth_roundtrip(spark, tmp_path, capsys):
    from sneldb_spark.auth import AuthConfig, AuthManager
    from sneldb_spark.cli import main
    from sneldb_spark.engine import SnelDB
    from sneldb_spark.http_server import SnelDBHttpServer

    auth = AuthManager(
        config=AuthConfig(initial_admin_user="admin", initial_admin_key="ak")
    )
    db = SnelDB(spark, str(tmp_path / "db"), auth=auth)
    server = SnelDBHttpServer(db).start()
    try:
        url = _url(server)
        # unauthenticated -> helpful failure, exit 1
        rc = main(["-u", url, "-q", 'DEFINE clis FIELDS { "n": "int" }'])
        err = capsys.readouterr().err
        assert rc == 1 and "Authentication" in err
        # HMAC credentials -> ok
        rc = main(
            ["-u", url, "--user-id", "admin", "--secret-key", "ak",
             "-q", 'DEFINE clis FIELDS { "n": "int" }']
        )
        assert rc == 0
    finally:
        server.stop()


def test_cli_config_layering(http_server, engine, tmp_path, capsys, monkeypatch):
    """Config file < env var < flag, reference priority order."""
    import argparse

    from sneldb_spark.cli import load_cli_config

    confdir = tmp_path / ".sneldb"
    confdir.mkdir()
    (confdir / "config").write_text(
        '[config]\nurl = "http://filehost:1"\nuser_id = "fileuser"\n'
        'secret_key = "filekey"\n'
    )
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HOME", str(tmp_path / "nohome"))  # only local file
    args = argparse.Namespace(url=None, token=None, user_id=None, secret_key=None)
    cfg = load_cli_config(args)
    assert cfg.url == "http://filehost:1" and cfg.user_id == "fileuser"

    monkeypatch.setenv("SNELDB_URL", "http://envhost:2")
    cfg = load_cli_config(args)
    assert cfg.url == "http://envhost:2"  # env beats file

    args.url = "http://flaghost:3"
    cfg = load_cli_config(args)
    assert cfg.url == "http://flaghost:3"  # flag beats env

    # a full HMAC pair suppresses a token from the same (or weaker) layer
    monkeypatch.setenv("SNELDB_TOKEN", "tok")
    monkeypatch.setenv("SNELDB_USER_ID", "envuser")
    monkeypatch.setenv("SNELDB_SECRET_KEY", "envkey")
    cfg = load_cli_config(args)
    assert cfg.token is None and cfg.user_id == "envuser"


def test_cli_explicit_token_beats_filed_credentials(tmp_path, monkeypatch):
    """--token must not be silently discarded because a config file holds
    a (possibly stale) user_id/secret_key pair: the more explicit layer's
    auth style wins."""
    import argparse

    from sneldb_spark.cli import load_cli_config

    confdir = tmp_path / ".sneldb"
    confdir.mkdir()
    (confdir / "config").write_text(
        '[config]\nuser_id = "fileuser"\nsecret_key = "filekey"\n'
    )
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HOME", str(tmp_path / "nohome"))
    monkeypatch.delenv("SNELDB_TOKEN", raising=False)
    monkeypatch.delenv("SNELDB_USER_ID", raising=False)
    monkeypatch.delenv("SNELDB_SECRET_KEY", raising=False)

    args = argparse.Namespace(
        url=None, token="cli-token", user_id=None, secret_key=None
    )
    cfg = load_cli_config(args)
    assert cfg.token == "cli-token"
    assert cfg.user_id is None and cfg.secret_key is None

    # and a flag-level pair still beats an env token
    monkeypatch.setenv("SNELDB_TOKEN", "envtok")
    args = argparse.Namespace(
        url=None, token=None, user_id="flaguser", secret_key="flagkey"
    )
    cfg = load_cli_config(args)
    assert cfg.token is None and cfg.user_id == "flaguser"


def test_cli_connection_refused_is_a_clean_error(tmp_path, monkeypatch, capsys):
    """tcp:// (and ws://, unix://) connection failures surface as raw
    OSError subclasses — the CLI must print `Error: ...`, not crash with
    a traceback."""
    from sneldb_spark.cli import main

    monkeypatch.chdir(tmp_path)  # no config file pickup
    monkeypatch.setenv("HOME", str(tmp_path / "nohome"))
    rc = main(["-u", "tcp://127.0.0.1:1", "-q", "PING"])
    assert rc == 1
    err = capsys.readouterr().err
    assert err.startswith("Error:")


def test_cli_history_file_is_home_anchored():
    from sneldb_spark import cli

    assert os.path.isabs(cli.HISTORY_FILE)
    assert os.path.dirname(cli.HISTORY_FILE) == os.path.expanduser("~")


def test_cli_interactive_session(http_server, engine, capsys, monkeypatch):
    """Scripted REPL: multiline query terminated by ';', blank-line
    termination, \\l limit, unknown backslash command, \\q exit."""
    import io

    from sneldb_spark.cli import main

    _seed(engine)
    script = (
        "\\l 2\n"
        "QUERY cliev\n"
        "  RETURN [n];\n"          # multiline, ';' terminates
        "QUERY cliev COUNT\n"
        "\n"                        # blank line terminates
        "\\nope\n"
        "\\q\n"
    )
    lines = iter(script.splitlines())

    def fake_input(prompt=""):
        try:
            return next(lines)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    rc = main(["-u", _url(http_server)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Row limit set to: 2" in out
    assert "(4 rows (showing 2))" in out     # \l 2 applied to the read
    assert "count" in out                     # COUNT result displayed
    assert "Goodbye!" in out


def test_cli_format_result_write_message():
    from sneldb_spark.cli import format_result
    from sneldb_spark.client import ClientResult

    assert format_result(ClientResult(ok=True, message="Stored")) == "Stored"
    table = format_result(
        ClientResult(
            ok=True,
            rows=[{"a": 1, "b": None}],
            columns=["a", "b"],
            row_count=1,
        )
    )
    assert "a" in table and "(1 row)" in table
