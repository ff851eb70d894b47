"""Users, permissions, HMAC authentication, and session tokens.

Semantics mirror the reference's auth engine
(reference: src/engine/auth/{manager,user_ops,permission_ops,signature,types}.rs):

- Users are ``(user_id, secret_key, roles, active)``. ``REVOKE KEY`` marks a
  user inactive (record kept for audit) and invalidates their session tokens.
- Permissions are per ``(user, event_type)`` read/write sets. Resolution
  priority is admin > specific permission > role (types.rs:163-235):
  a permission set with both flags false is an explicit denial that
  overrides roles; a write-only grant still lets a read role through for
  READ, while WRITE is decided solely by the permission set when present.
- Roles: ``admin`` (everything incl. user management), ``read-only``/
  ``viewer`` (read all), ``editor`` (read+write all), ``write-only``
  (write all). Unknown roles are stored but inert (types.rs:264-283).
- Authentication is HMAC-SHA256 over the command text with the user's
  secret key (signature.rs:12-55), hex-encoded, constant-time compared.
  ``AUTH <user>:<sig>`` (sig over the bare user_id) opens a session and
  returns a token usable as a ``... TOKEN <tok>`` suffix.

State is persisted as one JSON document next to the event store (the
reference uses a WAL + snapshot; a small atomic-rename JSON file is the
same durability point at this metadata scale).
"""

from __future__ import annotations

import hmac
import json
import os
import secrets
import time
from dataclasses import dataclass, field
from hashlib import sha256
from typing import Optional

from sneldb_spark.errors import SnelDBError

BYPASS_USER_ID = "bypass"
MAX_USER_ID_LENGTH = 64
MAX_SECRET_KEY_LENGTH = 512
MAX_SIGNATURE_LENGTH = 256

_READ_ROLES = {"read-only", "viewer", "editor"}
_WRITE_ROLES = {"editor", "write-only"}


class AuthError(SnelDBError):
    pass


@dataclass
class AuthConfig:
    bypass_auth: bool = False
    initial_admin_user: Optional[str] = None
    initial_admin_key: Optional[str] = None
    session_token_expiry_seconds: int = 300
    # Per-IP rate limiting of FAILED auth attempts (successful auths are
    # never limited) — reference [auth] config keys and defaults
    # (config/dev.toml:53-55, engine/auth/manager.rs verify_signature).
    rate_limit_enabled: bool = True
    rate_limit_per_second: int = 10


class _TokenBucketLimiter:
    """Per-key token bucket: burst == rate, refilled `rate`/second —
    the reference's governor Quota::per_second semantics
    (src/engine/auth/types.rs:337-349). Thread-safe; clock injectable
    for tests. Full buckets are pruned when the key table grows past
    `max_keys` so an address-spraying attacker can't balloon memory."""

    def __init__(self, rate: int, clock=time.time, max_keys: int = 100_000):
        if rate <= 0:
            raise ValueError("rate_limit_per_second must be greater than 0")
        import threading

        self.rate = float(rate)
        self.clock = clock
        self.max_keys = max_keys
        self._lock = threading.Lock()
        self._buckets: dict[str, tuple[float, float]] = {}  # key -> (tokens, ts)

    def allow(self, key: str) -> bool:
        now = float(self.clock())
        with self._lock:
            tokens, ts = self._buckets.get(key, (self.rate, now))
            tokens = min(self.rate, tokens + (now - ts) * self.rate)
            ok = tokens >= 1.0
            if ok:
                tokens -= 1.0
            self._buckets[key] = (tokens, now)
            if len(self._buckets) > self.max_keys:
                self._buckets = {
                    k: v
                    for k, v in self._buckets.items()
                    if min(self.rate, v[0] + (now - v[1]) * self.rate)
                    < self.rate
                }
            return ok


@dataclass
class PermissionSet:
    read: bool = False
    write: bool = False


@dataclass
class User:
    user_id: str
    secret_key: str
    roles: list[str] = field(default_factory=list)
    active: bool = True
    permissions: dict[str, PermissionSet] = field(default_factory=dict)


def sign(secret_key: str, message: str) -> str:
    """Hex HMAC-SHA256 of message — the wire signature format."""
    return hmac.new(secret_key.encode(), message.encode(), sha256).hexdigest()


class AuthManager:
    """User store + permission checks + session tokens.

    ``path=None`` keeps state in memory only (tests); otherwise every
    mutation rewrites ``<path>`` atomically.
    """

    def __init__(
        self,
        path: Optional[str] = None,
        config: AuthConfig | None = None,
        clock=time.time,
    ):
        import threading

        self.path = path
        self.config = config or AuthConfig()
        self.clock = clock
        # Frontends are threaded; grant/revoke are read-modify-write.
        self._lock = threading.Lock()
        self.users: dict[str, User] = {}
        self.sessions: dict[str, tuple[str, float]] = {}  # token -> (user, expiry)
        self._rate_limiter = (
            _TokenBucketLimiter(self.config.rate_limit_per_second, clock=clock)
            if self.config.rate_limit_enabled
            else None
        )
        if path and os.path.exists(path):
            self._load()
        if self.config.initial_admin_user and self.config.initial_admin_key:
            if self.config.initial_admin_user not in self.users:
                self._put(
                    User(
                        user_id=self.config.initial_admin_user,
                        secret_key=self.config.initial_admin_key,
                        roles=["admin"],
                    )
                )

    # -- persistence ------------------------------------------------------
    def _load(self):
        with open(self.path) as f:
            doc = json.load(f)
        for uid, u in doc.get("users", {}).items():
            self.users[uid] = User(
                user_id=uid,
                secret_key=u["secret_key"],
                roles=list(u.get("roles", [])),
                active=bool(u.get("active", True)),
                permissions={
                    et: PermissionSet(read=p["read"], write=p["write"])
                    for et, p in u.get("permissions", {}).items()
                },
            )

    def _save(self):
        if not self.path:
            return
        doc = {
            "users": {
                uid: {
                    "secret_key": u.secret_key,
                    "roles": u.roles,
                    "active": u.active,
                    "permissions": {
                        et: {"read": p.read, "write": p.write}
                        for et, p in u.permissions.items()
                    },
                }
                for uid, u in self.users.items()
            }
        }
        parent = os.path.dirname(self.path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self.path)

    def _put(self, user: User):
        self.users[user.user_id] = user
        self._save()

    # -- user management --------------------------------------------------
    def create_user(
        self,
        user_id: str,
        secret_key: Optional[str] = None,
        roles: Optional[list[str]] = None,
    ) -> str:
        self._validate_user_id(user_id)
        if secret_key is None:
            secret_key = secrets.token_hex(32)
        if len(secret_key) > MAX_SECRET_KEY_LENGTH:
            raise AuthError(f"Secret key too long (max {MAX_SECRET_KEY_LENGTH})")
        with self._lock:
            if user_id in self.users:
                raise AuthError(f"User already exists: {user_id}")
            self._put(
                User(user_id=user_id, secret_key=secret_key, roles=list(roles or []))
            )
        return secret_key

    def revoke_key(self, user_id: str):
        with self._lock:
            user = self.users.get(user_id)
            if user is None:
                raise AuthError(f"User not found: {user_id}")
            user.active = False
            # Inactive users must not keep live sessions (scenario
            # auth_with_token_inactive_user).
            self.sessions = {
                tok: (uid, exp)
                for tok, (uid, exp) in self.sessions.items()
                if uid != user_id
            }
            self._save()

    def list_users(self) -> list[User]:
        return sorted(self.users.values(), key=lambda u: u.user_id)

    @staticmethod
    def _validate_user_id(user_id: str):
        if (
            not user_id
            or len(user_id) > MAX_USER_ID_LENGTH
            or not all(c.isalnum() or c in "_-" for c in user_id)
        ):
            raise AuthError(f"Invalid user id: {user_id!r}")

    # -- permissions ------------------------------------------------------
    def grant(self, user_id: str, event_type: str, read: bool, write: bool):
        """Grant adds to the existing set; it never removes."""
        with self._lock:
            user = self.users.get(user_id)
            if user is None:
                raise AuthError(f"User not found: {user_id}")
            existing = user.permissions.get(event_type, PermissionSet())
            user.permissions[event_type] = PermissionSet(
                read=existing.read or read, write=existing.write or write
            )
            self._save()

    def revoke(self, user_id: str, event_type: str, read: bool, write: bool):
        """Clear the named flags; the (possibly all-false) set is KEPT as an
        explicit denial that overrides roles (types.rs:176-183)."""
        with self._lock:
            user = self.users.get(user_id)
            if user is None:
                raise AuthError(f"User not found: {user_id}")
            existing = user.permissions.get(event_type, PermissionSet())
            user.permissions[event_type] = PermissionSet(
                read=existing.read and not read, write=existing.write and not write
            )
            self._save()

    def get_permissions(self, user_id: str) -> dict[str, PermissionSet]:
        user = self.users.get(user_id)
        if user is None:
            raise AuthError(f"User not found: {user_id}")
        return dict(user.permissions)

    def _roles(self, user_id: str) -> set[str]:
        user = self.users.get(user_id)
        return set(user.roles) if user else set()

    def is_admin(self, user_id: str) -> bool:
        return user_id == BYPASS_USER_ID or "admin" in self._roles(user_id)

    def can_read(self, user_id: str, event_type: str) -> bool:
        if self.is_admin(user_id):
            return True
        user = self.users.get(user_id)
        if user is None:
            return False
        perms = user.permissions.get(event_type)
        if perms is not None:
            if perms.read:
                return True
            if not perms.read and not perms.write:
                return False  # explicit denial overrides roles
            # write-only grant: READ falls through to roles
        roles = set(user.roles)
        if roles & _READ_ROLES:
            return True
        return False

    def can_write(self, user_id: str, event_type: str) -> bool:
        if self.is_admin(user_id):
            return True
        user = self.users.get(user_id)
        if user is None:
            return False
        perms = user.permissions.get(event_type)
        if perms is not None:
            return perms.write  # a specific set fully decides WRITE
        return bool(set(user.roles) & _WRITE_ROLES)

    # -- authentication ---------------------------------------------------
    def verify_signature(
        self,
        message: str,
        user_id: str,
        signature: str,
        client_ip: Optional[str] = None,
    ):
        """HMAC check. With a `client_ip`, FAILED attempts are rate
        limited per IP (reference manager.rs:86-113: verify first,
        successful auths bypass the limiter entirely; once the bucket is
        drained the caller sees 'Rate limit exceeded' instead of the
        per-attempt failure)."""
        try:
            self._verify_signature_inner(message, user_id, signature)
        except AuthError:
            if client_ip is not None and self._rate_limiter is not None:
                if not self._rate_limiter.allow(client_ip):
                    raise AuthError("429 Rate limit exceeded") from None
            raise

    def _verify_signature_inner(self, message: str, user_id: str, signature: str):
        if len(signature) > MAX_SIGNATURE_LENGTH or len(user_id) > MAX_USER_ID_LENGTH:
            raise AuthError("Authentication failed")
        user = self.users.get(user_id)
        if user is None or not user.active:
            raise AuthError("Authentication failed")
        expected = sign(user.secret_key, message)
        if not hmac.compare_digest(signature.encode(), expected.encode()):
            raise AuthError("Authentication failed")

    def authenticate(
        self, user_id: str, signature: str, client_ip: Optional[str] = None
    ) -> str:
        """AUTH handshake: signature is HMAC(key, user_id). Returns a
        session token."""
        self.verify_signature(user_id, user_id, signature, client_ip=client_ip)
        token = secrets.token_hex(32)
        expiry = self.clock() + self.config.session_token_expiry_seconds
        with self._lock:
            self.sessions[token] = (user_id, expiry)
        return token

    def validate_session_token(self, token: str) -> Optional[str]:
        entry = self.sessions.get(token)
        if entry is None:
            return None
        user_id, expiry = entry
        if self.clock() > expiry:
            with self._lock:
                self.sessions.pop(token, None)
            return None
        user = self.users.get(user_id)
        if user is None or not user.active:
            return None
        return user_id
