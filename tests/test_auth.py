"""User management, permissions, and HMAC/token authentication.

Mirrors the reference's permissions_* / auth_* / create_user_* scenario
families (reference: tests/integration/scenarios.json) against the engine
API and the TCP frontend.
"""

import json
import socket

import pytest

from sneldb_spark.auth import AuthConfig, AuthManager, sign
from sneldb_spark.engine import SnelDB
from sneldb_spark.server import SnelDBServer

ADMIN = "admin"
ADMIN_KEY = "admin-key-123"


@pytest.fixture()
def auth_engine(spark, tmp_path):
    auth = AuthManager(
        path=str(tmp_path / "auth.json"),
        config=AuthConfig(
            bypass_auth=False, initial_admin_user=ADMIN, initial_admin_key=ADMIN_KEY
        ),
    )
    db = SnelDB(spark, str(tmp_path / "db"), auth=auth)
    db.execute('DEFINE products FIELDS { "product_id": "int", "name": "string" }', user_id=ADMIN)
    db.execute(
        'STORE products FOR ctx1 PAYLOAD {"product_id": 1, "name": "Widget"}', user_id=ADMIN
    )
    db.execute("FLUSH", user_id=ADMIN)
    return db


# -- user management ---------------------------------------------------------

def test_create_user_and_list(auth_engine):
    r = auth_engine.execute('CREATE USER reader WITH KEY "reader-key"', user_id=ADMIN)
    assert "User 'reader' created" in r.message
    assert "Secret key: reader-key" in r.message
    r = auth_engine.execute("LIST USERS", user_id=ADMIN)
    assert "admin: active" in r.message and "reader: active" in r.message


def test_create_user_generates_key(auth_engine):
    r = auth_engine.execute("CREATE USER nokey", user_id=ADMIN)
    key = r.message.split("Secret key: ")[1].strip()
    assert len(key) == 64 and int(key, 16) is not None


def test_create_duplicate_user_rejected(auth_engine):
    auth_engine.execute('CREATE USER dup WITH KEY "k"', user_id=ADMIN)
    r = auth_engine.try_execute('CREATE USER dup WITH KEY "k"', user_id=ADMIN)
    assert not r.ok and "already exists" in r.message


def test_user_management_requires_admin(auth_engine):
    auth_engine.execute('CREATE USER pleb WITH KEY "k"', user_id=ADMIN)
    r = auth_engine.try_execute('CREATE USER other WITH KEY "k2"', user_id="pleb")
    assert not r.ok and "Only admin users can manage users" in r.message
    r = auth_engine.try_execute("LIST USERS")
    assert not r.ok and "401 Authentication required" in r.message


def test_revoke_key_marks_inactive(auth_engine):
    auth_engine.execute('CREATE USER gone WITH KEY "k"', user_id=ADMIN)
    r = auth_engine.execute("REVOKE KEY gone", user_id=ADMIN)
    assert "Key revoked for user 'gone'" in r.message
    r = auth_engine.execute("LIST USERS", user_id=ADMIN)
    assert "gone: inactive" in r.message


# -- permission grants / revokes --------------------------------------------

def test_grant_read_allows_query(auth_engine):
    auth_engine.execute('CREATE USER reader WITH KEY "rk"', user_id=ADMIN)
    auth_engine.execute("GRANT READ ON products TO reader", user_id=ADMIN)
    r = auth_engine.execute("QUERY products WHERE product_id = 1", user_id="reader")
    rows = r.rows()
    assert len(rows) == 1 and rows[0]["name"] == "Widget"


def test_query_denied_without_read(auth_engine):
    auth_engine.execute('CREATE USER noread WITH KEY "nk"', user_id=ADMIN)
    auth_engine.execute("GRANT WRITE ON products TO noread", user_id=ADMIN)
    r = auth_engine.try_execute("QUERY products WHERE product_id = 1", user_id="noread")
    assert not r.ok
    assert "403 Read permission denied for event type 'products'" in r.message


def test_store_denied_without_write(auth_engine):
    auth_engine.execute('CREATE USER ro WITH KEY "k" WITH ROLES ["read-only"]', user_id=ADMIN)
    r = auth_engine.try_execute(
        'STORE products FOR c2 PAYLOAD {"product_id": 2, "name": "X"}', user_id="ro"
    )
    assert not r.ok
    assert "403 Write permission denied for event type 'products'" in r.message


def test_grant_validates_event_type(auth_engine):
    auth_engine.execute('CREATE USER u1 WITH KEY "k"', user_id=ADMIN)
    r = auth_engine.try_execute("GRANT READ ON nosuch TO u1", user_id=ADMIN)
    assert not r.ok and "No schema defined for event type 'nosuch'" in r.message


def test_grant_to_unknown_user_fails(auth_engine):
    r = auth_engine.try_execute("GRANT READ ON products TO ghost", user_id=ADMIN)
    assert not r.ok and "User not found" in r.message


def test_revoke_all_is_explicit_denial_overriding_role(auth_engine):
    # read-only role reads everything — until a REVOKE leaves an explicit
    # all-false permission set for that event type
    # (reference: src/engine/auth/types.rs:176-183).
    auth_engine.execute('CREATE USER viewer WITH KEY "k" WITH ROLES ["viewer"]', user_id=ADMIN)
    r = auth_engine.execute("QUERY products", user_id="viewer")
    assert len(r.rows()) == 1
    auth_engine.execute("REVOKE ON products FROM viewer", user_id=ADMIN)
    r = auth_engine.try_execute("QUERY products", user_id="viewer")
    assert not r.ok and "Read permission denied" in r.message


def test_write_only_grant_read_falls_through_to_role(auth_engine):
    # GRANT WRITE leaves read=false/write=true: WRITE is decided by the
    # set, READ falls through to the read-only role (types.rs:184-189).
    auth_engine.execute('CREATE USER mixed WITH KEY "k" WITH ROLES ["read-only"]', user_id=ADMIN)
    auth_engine.execute("GRANT WRITE ON products TO mixed", user_id=ADMIN)
    r = auth_engine.execute("QUERY products", user_id="mixed")
    assert len(r.rows()) == 1
    r = auth_engine.execute(
        'STORE products FOR c9 PAYLOAD {"product_id": 9, "name": "Y"}', user_id="mixed"
    )
    assert r.ok


def test_editor_role_reads_and_writes(auth_engine):
    auth_engine.execute('CREATE USER ed WITH KEY "k" WITH ROLES ["editor"]', user_id=ADMIN)
    assert auth_engine.execute("QUERY products", user_id="ed").ok
    assert auth_engine.execute(
        'STORE products FOR c3 PAYLOAD {"product_id": 3, "name": "Z"}', user_id="ed"
    ).ok
    r = auth_engine.try_execute('DEFINE other FIELDS { "a": "int" }', user_id="ed")
    assert not r.ok and "Only admin users can define schemas" in r.message


def test_show_permissions_output(auth_engine):
    auth_engine.execute('CREATE USER shown WITH KEY "k"', user_id=ADMIN)
    r = auth_engine.execute("SHOW PERMISSIONS FOR shown", user_id=ADMIN)
    assert "User 'shown' has no permissions" in r.message
    auth_engine.execute("GRANT READ, WRITE ON products TO shown", user_id=ADMIN)
    r = auth_engine.execute("SHOW PERMISSIONS FOR shown", user_id=ADMIN)
    assert "Permissions for user 'shown':" in r.message
    assert "products: read, write" in r.message
    auth_engine.execute("REVOKE WRITE ON products FROM shown", user_id=ADMIN)
    r = auth_engine.execute("SHOW PERMISSIONS FOR shown", user_id=ADMIN)
    assert "products: read" in r.message and "write" not in r.message.split(":")[-1]


def test_permissions_persist_across_reload(auth_engine, spark, tmp_path):
    auth_engine.execute('CREATE USER keeper WITH KEY "kk"', user_id=ADMIN)
    auth_engine.execute("GRANT READ ON products TO keeper", user_id=ADMIN)
    reloaded = AuthManager(path=auth_engine.auth.path, config=auth_engine.auth.config)
    assert reloaded.can_read("keeper", "products")
    assert not reloaded.can_write("keeper", "products")


# -- HMAC / token authentication ---------------------------------------------

def test_hmac_sign_verify_roundtrip():
    auth = AuthManager()
    auth.create_user("u", "secret")
    msg = "QUERY products WHERE product_id=1"
    auth.verify_signature(msg, "u", sign("secret", msg))
    with pytest.raises(Exception, match="Authentication failed"):
        auth.verify_signature(msg, "u", sign("wrong", msg))


def test_token_lifecycle_and_inactive_user():
    now = {"t": 1000.0}
    auth = AuthManager(config=AuthConfig(session_token_expiry_seconds=300), clock=lambda: now["t"])
    auth.create_user("u", "secret")
    token = auth.authenticate("u", sign("secret", "u"))
    assert auth.validate_session_token(token) == "u"
    now["t"] += 301
    assert auth.validate_session_token(token) is None  # expired
    token2 = auth.authenticate("u", sign("secret", "u"))
    auth.revoke_key("u")
    assert auth.validate_session_token(token2) is None  # inactive user


# -- TCP frontend wire protocol ----------------------------------------------

def _send_lines(address, lines, timeout=60.0):
    """Interactive client: send one line, read one reply line each."""
    replies = []
    with socket.create_connection(address, timeout=timeout) as sock:
        f = sock.makefile("rwb")
        for line in lines:
            f.write((line + "\n").encode())
            f.flush()
            replies.append(json.loads(f.readline()))
    return replies


def test_tcp_inline_signature_and_token_flow(auth_engine):
    auth_engine.execute('CREATE USER wire WITH KEY "wire-key"', user_id=ADMIN)
    auth_engine.execute("GRANT READ, WRITE ON products TO wire", user_id=ADMIN)
    server = SnelDBServer(auth_engine).start()
    try:
        store_cmd = 'STORE products FOR w1 PAYLOAD {"product_id": 7, "name": "Wired"}'
        # stateless inline user:sig:command
        r1 = _send_lines(
            server.address, [f"wire:{sign('wire-key', store_cmd)}:{store_cmd}"]
        )[0]
        assert r1["type"] == "ok"
        # unauthenticated command is rejected
        r2 = _send_lines(server.address, [store_cmd])[0]
        assert r2["type"] == "error" and "Authentication" in r2["message"]
        # AUTH handshake -> token suffix auth
        replies = _send_lines(
            server.address, [f"AUTH wire:{sign('wire-key', 'wire')}"]
        )
        assert replies[0]["type"] == "ok" and replies[0]["message"].startswith("OK TOKEN ")
        token = replies[0]["message"].split()[-1]
        r3 = _send_lines(server.address, [f"{store_cmd} TOKEN {token}"])[0]
        assert r3["type"] == "ok"
        r4 = _send_lines(server.address, [f"{store_cmd} TOKEN bogus"])[0]
        assert r4["type"] == "error" and "Authentication failed" in r4["message"]
    finally:
        server.stop()


def test_tcp_connection_scoped_signature(auth_engine):
    auth_engine.execute('CREATE USER conn WITH KEY "conn-key"', user_id=ADMIN)
    auth_engine.execute("GRANT READ ON products TO conn", user_id=ADMIN)
    server = SnelDBServer(auth_engine).start()
    try:
        q = "QUERY products WHERE product_id = 1"
        with socket.create_connection(server.address, timeout=60.0) as sock:
            f = sock.makefile("rwb")
            f.write((f"AUTH conn:{sign('conn-key', 'conn')}\n").encode())
            f.flush()
            assert json.loads(f.readline())["message"].startswith("OK TOKEN ")
            f.write((f"{sign('conn-key', q)}:{q}\n").encode())
            f.flush()
            frames = []
            while True:
                frame = json.loads(f.readline())
                frames.append(frame)
                if frame["type"] in ("end", "error"):
                    break
        kinds = [fr["type"] for fr in frames]
        assert kinds[0] == "schema" and kinds[-1] == "end"
    finally:
        server.stop()


def test_bypass_mode_skips_all_checks(spark, tmp_path):
    auth = AuthManager(config=AuthConfig(bypass_auth=True))
    db = SnelDB(spark, str(tmp_path / "db"), auth=auth)
    server = SnelDBServer(db).start()
    try:
        r = _send_lines(server.address, ['DEFINE ev FIELDS { "x": "int" }'])[0]
        assert r["type"] == "ok"
    finally:
        server.stop()


def test_forget_requires_admin(auth_engine):
    """FORGET permanently drops a materialization — gated like DEFINE
    (ADVICE r4: it was previously callable unauthenticated)."""
    auth_engine.execute(
        "REMEMBER QUERY products WHERE product_id >= 0 AS pmat", user_id=ADMIN
    )
    auth_engine.execute('CREATE USER pleb WITH KEY "k"', user_id=ADMIN)
    r = auth_engine.try_execute("FORGET pmat", user_id="pleb")
    assert not r.ok and "Only admin users can forget materializations" in r.message
    r = auth_engine.try_execute("FORGET pmat")  # unauthenticated
    assert not r.ok and "401" in r.message
    r = auth_engine.execute("FORGET pmat", user_id=ADMIN)
    assert r.ok


# -- failed-auth rate limiting (reference: manager.rs verify_signature,
# config keys [auth] rate_limit_enabled / rate_limit_per_second) ----------

def test_failed_auth_rate_limited_per_ip():
    clock = {"t": 1000.0}
    auth = AuthManager(
        config=AuthConfig(
            bypass_auth=False,
            initial_admin_user=ADMIN,
            initial_admin_key=ADMIN_KEY,
            rate_limit_per_second=3,
        ),
        clock=lambda: clock["t"],
    )
    from sneldb_spark.auth import AuthError

    # burst = rate: the first 3 failures report the per-attempt error
    for _ in range(3):
        with pytest.raises(AuthError, match="Authentication failed"):
            auth.verify_signature("msg", ADMIN, "bad", client_ip="1.2.3.4")
    # bucket drained -> the limiter takes over
    with pytest.raises(AuthError, match="Rate limit exceeded"):
        auth.verify_signature("msg", ADMIN, "bad", client_ip="1.2.3.4")
    # per-IP: another address still sees the plain failure
    with pytest.raises(AuthError, match="Authentication failed"):
        auth.verify_signature("msg", ADMIN, "bad", client_ip="5.6.7.8")
    # successful auth bypasses the limiter entirely, even while limited
    auth.verify_signature("msg", ADMIN, sign(ADMIN_KEY, "msg"), client_ip="1.2.3.4")
    # tokens refill with time
    clock["t"] += 1.0
    with pytest.raises(AuthError, match="Authentication failed"):
        auth.verify_signature("msg", ADMIN, "bad", client_ip="1.2.3.4")
    # no client context (embedded/Unix-socket callers): never limited
    for _ in range(10):
        with pytest.raises(AuthError, match="Authentication failed"):
            auth.verify_signature("msg", ADMIN, "bad")


def test_failed_auth_rate_limit_disabled():
    auth = AuthManager(
        config=AuthConfig(
            bypass_auth=False,
            initial_admin_user=ADMIN,
            initial_admin_key=ADMIN_KEY,
            rate_limit_enabled=False,
        ),
    )
    from sneldb_spark.auth import AuthError

    for _ in range(50):
        with pytest.raises(AuthError, match="Authentication failed"):
            auth.verify_signature("msg", ADMIN, "bad", client_ip="1.2.3.4")


def test_failed_auth_rate_limit_over_tcp(spark, tmp_path):
    """The TCP frontend feeds the peer IP to the limiter: spamming bad
    inline credentials flips the error to 'Rate limit exceeded'."""
    auth = AuthManager(
        config=AuthConfig(
            bypass_auth=False,
            initial_admin_user=ADMIN,
            initial_admin_key=ADMIN_KEY,
            rate_limit_per_second=2,
        ),
    )
    db = SnelDB(spark, str(tmp_path / "db"), auth=auth)
    server = SnelDBServer(db).start()
    try:
        replies = _send_lines(
            server.address, ["admin:badsig:PING"] * 4
        )
        msgs = [r["message"] for r in replies]
        assert all(r["type"] == "error" for r in replies)
        assert msgs[0].endswith("Authentication failed")
        assert any("Rate limit exceeded" in m for m in msgs[2:])
        # a correctly signed command still goes through afterwards
        good = sign(ADMIN_KEY, "PING")
        ok = _send_lines(server.address, [f"admin:{good}:PING"])[0]
        assert ok["type"] == "ok"
    finally:
        server.stop()
