"""Authentication & authorization for the control plane — stdlib only.

Mirrors the reference's security layer (security/auth.py:33-599:
Permission/Role model, User with permission checks, SecurityManager
with password hashing, expiring signed tokens, API keys, fixed-window
rate limiting, a security-event audit log, and require_permission /
require_role decorators) with these substitutions:

- passwords: PBKDF2-HMAC-SHA256 (240k iterations, per-user salt) via
  ``hashlib.pbkdf2_hmac`` instead of bcrypt (not in this environment);
- tokens: HMAC-SHA256-signed JSON (JWT-shaped header.payload.signature,
  base64url) instead of PyJWT — same expiry/claims semantics,
  constant-time verification;
- state: injectable in-memory stores instead of redis (the reference's
  redis is its session store; callers can persist the ``users`` /
  ``api_keys`` dicts however they deploy);
- encrypt_data/decrypt_data: gated on the ``cryptography`` package
  (Fernet) with a clear error when absent — hand-rolled stream ciphers
  are not an acceptable substitute.

API keys are stored HASHED (sha256) — a leaked store does not leak
keys; the plaintext is shown exactly once at creation, reference
create_api_key:406-435 behavior.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import secrets
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from enum import Enum


class Permission(Enum):
    READ_DATA = "read_data"
    WRITE_DATA = "write_data"
    EXECUTE_PIPELINE = "execute_pipeline"
    MANAGE_PIPELINES = "manage_pipelines"
    VIEW_METRICS = "view_metrics"
    MANAGE_USERS = "manage_users"
    ADMIN = "admin"


class Role(Enum):
    VIEWER = "viewer"
    ANALYST = "analyst"
    ENGINEER = "engineer"
    ADMIN = "admin"


ROLE_PERMISSIONS: dict[Role, set[Permission]] = {
    Role.VIEWER: {Permission.READ_DATA, Permission.VIEW_METRICS},
    Role.ANALYST: {Permission.READ_DATA, Permission.VIEW_METRICS,
                   Permission.EXECUTE_PIPELINE},
    Role.ENGINEER: {Permission.READ_DATA, Permission.WRITE_DATA,
                    Permission.VIEW_METRICS, Permission.EXECUTE_PIPELINE,
                    Permission.MANAGE_PIPELINES},
    Role.ADMIN: set(Permission),
}


@dataclass
class User:
    user_id: str
    username: str
    email: str = ""
    roles: list[Role] = field(default_factory=list)
    permissions: set[Permission] = field(default_factory=set)
    active: bool = True

    def effective_permissions(self) -> set[Permission]:
        out = set(self.permissions)
        for r in self.roles:
            out |= ROLE_PERMISSIONS.get(r, set())
        return out

    def has_permission(self, permission: Permission) -> bool:
        eff = self.effective_permissions()
        return permission in eff or Permission.ADMIN in eff

    def has_any_permission(self, permissions) -> bool:
        return any(self.has_permission(p) for p in permissions)

    def has_all_permissions(self, permissions) -> bool:
        return all(self.has_permission(p) for p in permissions)


@dataclass
class SecurityEvent:
    event_type: str
    action: str
    success: bool
    username: str | None = None
    ip_address: str | None = None
    timestamp: float = field(default_factory=time.time)


def _b64(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _unb64(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class SecurityManager:
    """User store + credentials + tokens + API keys + audit log."""

    PBKDF2_ITERATIONS = 240_000

    def __init__(
        self,
        secret: str | None = None,
        token_ttl: float = 3600.0,
        max_failed_attempts: int = 5,
        rate_window: float = 300.0,
    ):
        self._secret = (secret or secrets.token_hex(32)).encode()
        self._token_ttl = token_ttl
        self._max_failed = max_failed_attempts
        self._rate_window = rate_window
        self.users: dict[str, dict] = {}           # username -> record
        self.api_keys: dict[str, dict] = {}        # sha256(key) -> record
        self._failures: dict[str, list[float]] = {}
        self.events: list[SecurityEvent] = []

    # -- passwords ----------------------------------------------------

    def _hash_password(self, password: str, salt: bytes | None = None) -> str:
        salt = salt or secrets.token_bytes(16)
        digest = hashlib.pbkdf2_hmac(
            "sha256", password.encode(), salt, self.PBKDF2_ITERATIONS
        )
        return f"pbkdf2${self.PBKDF2_ITERATIONS}${_b64(salt)}${_b64(digest)}"

    def _verify_password(self, password: str, stored: str) -> bool:
        try:
            _, iters, salt_b64, digest_b64 = stored.split("$")
            digest = hashlib.pbkdf2_hmac(
                "sha256", password.encode(), _unb64(salt_b64), int(iters)
            )
            return hmac.compare_digest(digest, _unb64(digest_b64))
        except (ValueError, TypeError):
            return False

    # -- users --------------------------------------------------------

    def create_user(self, username: str, email: str, password: str,
                    roles: list[Role] | None = None) -> User:
        if username in self.users:
            raise ValueError(f"user already exists: {username}")
        if len(password) < 8:
            raise ValueError("password must be at least 8 characters")
        user = User(
            user_id=uuid_hex(), username=username, email=email,
            roles=list(roles or [Role.VIEWER]),
        )
        self.users[username] = {
            "user": user,
            "password_hash": self._hash_password(password),
        }
        self._log("user", "create", True, username)
        return user

    def deactivate_user(self, username: str) -> None:
        rec = self.users.get(username)
        if rec:
            rec["user"].active = False
            self._log("user", "deactivate", True, username)

    # -- authentication / tokens -------------------------------------

    def authenticate_user(self, username: str, password: str,
                          ip_address: str | None = None) -> str | None:
        """Password login -> signed token, or None. Locked out after
        ``max_failed_attempts`` failures inside ``rate_window`` seconds
        (reference _check_rate_limit:466-515)."""
        if not self._check_rate_limit(f"login:{username}"):
            self._log("auth", "login_rate_limited", False, username,
                      ip_address)
            return None
        rec = self.users.get(username)
        ok = (
            rec is not None
            and rec["user"].active
            and self._verify_password(password, rec["password_hash"])
        )
        if not ok:
            self._failures.setdefault(f"login:{username}", []).append(
                time.time()
            )
            self._log("auth", "login", False, username, ip_address)
            return None
        self._failures.pop(f"login:{username}", None)
        self._log("auth", "login", True, username, ip_address)
        return self._issue_token(rec["user"])

    def _issue_token(self, user: User) -> str:
        header = _b64(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
        payload = _b64(json.dumps({
            "sub": user.username,
            "uid": user.user_id,
            "roles": [r.value for r in user.roles],
            "exp": time.time() + self._token_ttl,
        }).encode())
        signing_input = f"{header}.{payload}".encode()
        sig = _b64(hmac.new(self._secret, signing_input,
                            hashlib.sha256).digest())
        return f"{header}.{payload}.{sig}"

    def verify_token(self, token: str) -> User | None:
        try:
            header, payload, sig = token.split(".")
        except ValueError:
            return None
        signing_input = f"{header}.{payload}".encode()
        expect = _b64(hmac.new(self._secret, signing_input,
                               hashlib.sha256).digest())
        if not hmac.compare_digest(sig, expect):
            self._log("auth", "token_bad_signature", False)
            return None
        try:
            claims = json.loads(_unb64(payload))
        except ValueError:
            return None
        if time.time() > float(claims.get("exp", 0)):
            self._log("auth", "token_expired", False, claims.get("sub"))
            return None
        rec = self.users.get(claims.get("sub"))
        if rec is None or not rec["user"].active:
            return None
        return rec["user"]

    # -- API keys -----------------------------------------------------

    def create_api_key(self, username: str, name: str) -> str:
        rec = self.users.get(username)
        if rec is None:
            raise ValueError(f"unknown user: {username}")
        key = f"dpf_{secrets.token_urlsafe(32)}"
        self.api_keys[hashlib.sha256(key.encode()).hexdigest()] = {
            "username": username, "name": name, "created": time.time(),
            "active": True,
        }
        self._log("api_key", "create", True, username)
        return key  # plaintext shown exactly once

    def verify_api_key(self, api_key: str,
                       ip_address: str | None = None) -> User | None:
        rec = self.api_keys.get(
            hashlib.sha256(api_key.encode()).hexdigest()
        )
        if rec is None or not rec["active"]:
            self._log("api_key", "verify", False, None, ip_address)
            return None
        urec = self.users.get(rec["username"])
        if urec is None or not urec["user"].active:
            return None
        self._log("api_key", "verify", True, rec["username"], ip_address)
        return urec["user"]

    def revoke_api_key(self, api_key: str) -> bool:
        rec = self.api_keys.get(
            hashlib.sha256(api_key.encode()).hexdigest()
        )
        if rec is None:
            return False
        rec["active"] = False
        self._log("api_key", "revoke", True, rec["username"])
        return True

    # -- rate limiting / audit ---------------------------------------

    def _check_rate_limit(self, identifier: str) -> bool:
        now = time.time()
        window = [
            t for t in self._failures.get(identifier, [])
            if now - t < self._rate_window
        ]
        self._failures[identifier] = window
        return len(window) < self._max_failed

    def _log(self, event_type: str, action: str, success: bool,
             username: str | None = None,
             ip_address: str | None = None) -> None:
        self.events.append(SecurityEvent(
            event_type=event_type, action=action, success=success,
            username=username, ip_address=ip_address,
        ))

    def get_security_events(self, limit: int = 100,
                            event_type: str | None = None
                            ) -> list[SecurityEvent]:
        evs = self.events
        if event_type is not None:
            evs = [e for e in evs if e.event_type == event_type]
        return evs[-limit:]

    # -- encryption (gated) ------------------------------------------

    def encrypt_data(self, data: str) -> str:
        """Fernet encryption when the ``cryptography`` package is
        present; refuses otherwise — a hand-rolled cipher would be
        worse than an honest error."""
        fernet = self._fernet()
        return fernet.encrypt(data.encode()).decode()

    def decrypt_data(self, token: str) -> str:
        return self._fernet().decrypt(token.encode()).decode()

    def _fernet(self):
        try:
            from cryptography.fernet import Fernet
        except ImportError as e:
            raise NotImplementedError(
                "encrypt_data/decrypt_data need the `cryptography` "
                "package (not installed in this environment)"
            ) from e
        key = base64.urlsafe_b64encode(
            hashlib.sha256(self._secret).digest()
        )
        return Fernet(key)


def uuid_hex() -> str:
    import uuid

    return uuid.uuid4().hex


def require_permission(permission: Permission):
    """Decorator: the wrapped callable must receive ``user=``; raises
    PermissionError otherwise (reference require_permission:568-583)."""
    def decorator(fn: Callable) -> Callable:
        def wrapper(*args, user: User | None = None, **kwargs):
            if user is None or not user.has_permission(permission):
                raise PermissionError(
                    f"permission {permission.value} required"
                )
            return fn(*args, user=user, **kwargs)

        wrapper.__name__ = fn.__name__
        return wrapper

    return decorator


def require_role(role: Role):
    def decorator(fn: Callable) -> Callable:
        def wrapper(*args, user: User | None = None, **kwargs):
            if user is None or role not in user.roles:
                raise PermissionError(f"role {role.value} required")
            return fn(*args, user=user, **kwargs)

        wrapper.__name__ = fn.__name__
        return wrapper

    return decorator
