"""Declarative scenario ports: run the reference's integration scenarios
through this engine and apply the reference's matcher semantics.

Runner model (reference: tests/integration/{runner.rs,matcher.rs,
auth_helper.rs}): execute every command in order against one engine,
concatenate ALL responses — rendered in the reference's line protocol
("<code> <message>" header, then JSON frames for result rows, matching
the reference's UnixRenderer + JSON batch frames) — then check substring
(include / include_all / include_none) and regex matchers against the
whole output.

Auth preprocessing mirrors the reference runner exactly:
- ``HMAC_SHA256(key, message)`` placeholders are computed client-side;
- a ``user_id=U signature=S`` suffix is stripped and the signature
  verified against the remaining command text (the reference converts to
  the inline ``U:S:command`` wire form — same check);
- in auth mode, admin-only commands without explicit auth are signed as
  the configured initial admin, everything else runs unauthenticated;
- ``AUTH user_id=U signature=S`` performs the handshake and yields
  ``OK TOKEN <tok>``; ``{TOKEN:user}`` placeholders substitute the last
  token minted for that user; a trailing ``TOKEN <tok>`` authenticates
  by session token.
- ``RESTART`` re-opens the engine on the same root (WAL + registry +
  Parquet recovery path); ``SLEEP`` is skipped (the test clock ticks).
"""

import os
import re

import pytest

from sneldb_spark.auth import AuthConfig, AuthManager, sign
from sneldb_spark.response import json_frames
from tests._ported_scenarios import SCENARIOS

_ADMIN_CMDS = (
    "CREATE USER", "GRANT", "REVOKE", "SHOW PERMISSIONS", "DEFINE", "LIST USERS",
)


def _hmac_placeholders(cmd: str) -> str:
    # reference auth_helper.rs: replace HMAC_SHA256(key, message) with the
    # hex signature; the message runs to the FIRST ')' (as in the original).
    while True:
        start = cmd.find("HMAC_SHA256(")
        if start < 0:
            return cmd
        end = cmd.find(")", start)
        if end < 0:
            return cmd
        inner = cmd[start + len("HMAC_SHA256(") : end]
        key, _, message = inner.partition(",")
        cmd = cmd.replace(
            cmd[start : end + 1], sign(key.strip().strip('"'), message.strip())
        )


def _split_auth_suffix(cmd: str):
    m = re.search(r"\s*user_id=(\S+)\s+signature=(\S+)\s*$", cmd)
    if not m:
        return cmd, None, None
    return cmd[: m.start()].strip(), m.group(1), m.group(2)


def _render(res) -> list[str]:
    # the reference's line protocol (UnixRenderer): "<code> <status>" header
    # ("200 OK" on success), then message body lines, then result frames
    out = []
    msg = res.message or ""
    if msg[:3].isdigit() and msg[3:4] == " ":
        out.append(msg)  # error messages carry their own status code
    elif res.ok:
        out.append("200 OK")
        if msg and msg != "OK":
            out.append(msg)
    else:
        out.append("400 " + (msg or "Bad Request"))
    if res.df is not None:
        out.extend(json_frames(res.df))
    return out


def _run(spark, root, clock, commands, config, allow_core_shadow=False) -> str:
    from sneldb_spark.engine import Result, SnelDB
    from sneldb_spark.errors import SnelDBError

    auth_cfg = config.get("auth")
    admin_user = admin_key = None
    enforce = bool(config.get("auth_enforced"))
    if enforce:
        admin_user = auth_cfg.get("initial_admin_user")
        admin_key = auth_cfg.get("initial_admin_key")
        auth = AuthManager(
            config=AuthConfig(
                initial_admin_user=admin_user, initial_admin_key=admin_key
            )
        )
    else:
        # bypass_auth mode: the reference still runs user-management
        # commands, dispatched as the synthetic bypass principal
        auth = AuthManager()
    wal = not config.get("wal_disabled")

    def _storage():
        # opt-in lane: replay the full reference scenario corpus against
        # the pointer-flip object backend (SNELDB_TEST_STORAGE=object)
        if os.environ.get("SNELDB_TEST_STORAGE") == "object":
            from sneldb_spark.store.storage import (
                DirObjectClient,
                ObjectStoreStorage,
            )

            return ObjectStoreStorage(DirObjectClient(root))
        return None

    engine = SnelDB(spark, root, clock=clock, auth=auth, wal=wal,
                    allow_core_shadow=allow_core_shadow, storage=_storage())
    tokens: dict[str, str] = {}
    chunks: list[str] = []
    for raw in commands:
        word = raw.split()[0].upper() if raw.split() else ""
        if word == "SLEEP":
            continue
        if word == "RESTART":
            engine = SnelDB(spark, root, clock=clock, auth=auth, wal=wal,
                            allow_core_shadow=allow_core_shadow,
                            storage=_storage())
            continue
        cmd = _hmac_placeholders(raw)
        for user, tok in tokens.items():
            cmd = cmd.replace("{TOKEN:%s}" % user, tok)

        user_id = None
        try:
            if not enforce:
                from sneldb_spark.auth import BYPASS_USER_ID

                res = engine.try_execute(cmd, user_id=BYPASS_USER_ID)
            else:
                cmd, sig_user, sig = _split_auth_suffix(cmd)
                if word == "AUTH":
                    # AUTH handshake -> OK TOKEN <tok> (tcp listener format)
                    if sig_user is None:  # AUTH user:sig form
                        body = cmd[5:].strip()
                        sig_user, _, sig = body.partition(":")
                    tok = engine.auth.authenticate(sig_user, sig)
                    tokens[sig_user] = tok
                    chunks.append(f"OK TOKEN {tok}")
                    continue
                tm = re.search(r"\s+TOKEN\s*(\S*)\s*$", cmd)
                if sig_user is not None:
                    engine.auth.verify_signature(cmd, sig_user, sig)
                    user_id = sig_user
                elif tm:
                    user_id = engine.auth.validate_session_token(tm.group(1))
                    cmd = cmd[: tm.start()].strip()
                    if user_id is None:
                        raise SnelDBError("401 Authentication failed")
                elif cmd.upper().startswith(_ADMIN_CMDS) and admin_user:
                    # reference runner signs admin-only commands as admin
                    user_id = admin_user
                else:
                    raise SnelDBError("401 Authentication failed")
                res = engine.try_execute(cmd, user_id=user_id)
        except SnelDBError as e:
            res = Result(ok=False, message=str(e))
        chunks.extend(_render(res))
    return "\n".join(chunks)


# Documented divergence, pinned as ASSERTED behavior (not xfail): these
# scenarios DEFINE payload fields named after core columns (event_id /
# timestamp). The reference tolerates the shadowing because it stores
# per-(uid, field) column files; this engine stores one Parquet dataset
# per type where core and payload share a namespace, and silently
# shadowing a core column would corrupt reads — the registry rejects the
# DEFINE loudly instead (SchemaError "field name ... is reserved"), and
# the run stays healthy: every later command answers a clean frame
# rather than crashing or corrupting. test_reserved_field_divergence
# asserts exactly that for each scenario.
_RESERVED_FIELD_DIVERGENCE = {
    "sequence_followed_by_with_common_where": "'timestamp'",
    "remember_query_with_limit": "'event_id'",
    "permissions_grant_write_only": "'event_id'",
}


@pytest.mark.parametrize("name", sorted(_RESERVED_FIELD_DIVERGENCE))
def test_reserved_field_divergence(spark, tmp_path, name):
    """The three reference scenarios whose payloads shadow core columns:
    the DEFINE is rejected with the reserved-field error (this engine's
    documented divergence), and the scenario run completes without a
    crash — later commands fail cleanly against the undefined type."""
    commands, matchers, config = next(
        (c, m, cfg) for n, c, m, cfg in SCENARIOS if n == name
    )
    clock = {"now": 1_700_000_000}

    def tick():
        clock["now"] += 1
        return clock["now"]

    out = _run(spark, str(tmp_path / "db"), tick, commands, config)
    assert f"field name {_RESERVED_FIELD_DIVERGENCE[name]} is reserved" in out
    # the reference's expected outputs must NOT appear: the divergence is
    # a rejection, not a silent partial success
    assert '"type":"end"' not in out or "error" in out


@pytest.mark.parametrize("name", sorted(_RESERVED_FIELD_DIVERGENCE))
def test_reserved_field_scenarios_pass_under_compat_flag(spark, tmp_path, name):
    """[schema] allow_core_shadow closes the divergence: the shadowing
    payload fields land in payload_<name> columns, queries naming them
    resolve to the payload column, and the reference's own matchers pass
    verbatim. The default (rejection) stays pinned by
    test_reserved_field_divergence above."""
    commands, matchers, config = next(
        (c, m, cfg) for n, c, m, cfg in SCENARIOS if n == name
    )
    clock = {"now": 1_700_000_000}

    def tick():
        clock["now"] += 1
        return clock["now"]

    out = _run(spark, str(tmp_path / "db"), tick, commands, config,
               allow_core_shadow=True)
    assert "is reserved" not in out
    for kind, value in matchers:
        if kind == "include":
            assert value in out, f"{name}: expected {value!r} in output"
        elif kind == "include_all":
            for frag in value:
                assert frag in out, f"{name}: expected {frag!r} in output"
        elif kind == "include_none":
            for frag in value:
                assert frag not in out, f"{name}: did not expect {frag!r}"
        elif kind in ("regex", "match"):
            pat = value
            if "(?s)" in pat:
                pat = "(?s)" + pat.replace("(?s)", "")
            assert re.search(pat, out), f"{name}: regex {value!r} not found"


# every scenario runs: the three divergent ones through their asserted-
# rejection test above, the rest through the reference matchers below
_PARITY_SCENARIOS = [s for s in SCENARIOS if s[0] not in _RESERVED_FIELD_DIVERGENCE]


@pytest.mark.parametrize(
    "name,commands,matchers,config",
    _PARITY_SCENARIOS,
    ids=[s[0] for s in _PARITY_SCENARIOS],
)
def test_ported_scenario(spark, tmp_path, name, commands, matchers, config):
    clock = {"now": 1_700_000_000}

    def tick():
        clock["now"] += 1
        return clock["now"]

    out = _run(spark, str(tmp_path / "db"), tick, commands, config)
    for kind, value in matchers:
        if kind == "include":
            assert value in out, f"{name}: expected {value!r} in output"
        elif kind == "include_all":
            for frag in value:
                assert frag in out, f"{name}: expected {frag!r} in output"
        elif kind == "include_none":
            for frag in value:
                assert frag not in out, f"{name}: did not expect {frag!r}"
        elif kind in ("regex", "match"):
            # Rust regex allows inline (?s) mid-pattern; Python requires
            # global flags at the start — hoist them.
            pat = value
            if "(?s)" in pat:
                pat = "(?s)" + pat.replace("(?s)", "")
            assert re.search(pat, out), f"{name}: regex {value!r} not found"
        else:  # pragma: no cover
            raise AssertionError(f"unknown matcher kind {kind}")
