"""User / ACL / quota layer — the admin surface the reference exposes
via `Client::CreateUser/DeleteUser/ChangePwd/AddUserToGroup/
DeleteUserFromGroup` (include/tera/client.h:78-84), per-table admin /
admin_group (src/proto/table_schema.proto:57,59), auth policies
(src/access/access_entry.h — kNoneAuthPolicy passes everything, the
ugi policy checks user+password), and the table quota machinery
(src/proto/quota.proto QuotaOperationType write/read/scan × reqs/bytes
with per-period limits; atomic CheckAndConsume in
src/quota/quota_entry.h:33).

Spark mapping: there is no request path to interpose on — enforcement
happens at the catalog boundary (append / view / DDL), which is where
a lakehouse engine checks ACLs anyway. State is a JSON document next
to the catalog root, so every driver/executor-side session sees one
consistent policy; quota consumption is driver-side bookkeeping (the
Spark analog of the tablet server's token buckets — job admission, not
per-RPC throttling).

Auth policy 'none' (the reference default) keeps the whole layer
inert, so existing catalogs are unaffected until a policy is set.
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path

# QuotaOperationType (src/proto/quota.proto:5-12)
QUOTA_OPS = (
    "write_reqs",
    "write_bytes",
    "read_reqs",
    "read_bytes",
    "scan_reqs",
    "scan_bytes",
)

_ACTION_FOR_OP = {
    "write_reqs": "write",
    "write_bytes": "write",
    "read_reqs": "read",
    "read_bytes": "read",
    "scan_reqs": "read",
    "scan_bytes": "read",
}


class AccessDenied(Exception):
    pass


class QuotaExceeded(Exception):
    pass


def _pwd_hash(user: str, password: str) -> str:
    return hashlib.sha256(f"{user}\x00{password}".encode()).hexdigest()


class AccessControl:
    """Users, groups, per-table admin, and table quotas.

    ``policy='none'`` (default) authorizes everything — the reference's
    kNoneAuthPolicy. ``policy='ugi'`` requires a known user; writes and
    reads are open to any authenticated user (tera's model — table
    *admin* is the protected role), admin actions (schema change, drop,
    disable, quota set) require the table's admin or admin_group.
    """

    def __init__(self, root: str | Path, *, policy: str = "none"):
        if policy not in ("none", "ugi"):
            raise ValueError(f"unknown auth policy: {policy}")
        self.path = Path(root) / "_access.json"
        if self.path.exists():
            self._state = json.loads(self.path.read_text())
        else:
            self._state = {
                "policy": policy,
                "users": {},        # user -> {pwd: hash, groups: [..]}
                "tables": {},       # table -> {admin: str|None, admin_group: str|None}
                "quotas": {},       # table -> {op: {limit, period}}
                "consumed": {},     # table -> {op: {window_start, used}}
            }
            self._save()
        if policy != "none":
            self._state["policy"] = policy
            self._save()

    def _save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(self._state, indent=1, sort_keys=True))

    @property
    def policy(self) -> str:
        return self._state["policy"]

    # --- user admin (client.h:78-84) ----------------------------------
    def create_user(self, user: str, password: str) -> None:
        if user in self._state["users"]:
            raise ValueError(f"user exists: {user}")
        self._state["users"][user] = {"pwd": _pwd_hash(user, password), "groups": []}
        self._save()

    def delete_user(self, user: str) -> None:
        self._state["users"].pop(user, None)
        self._save()

    def change_pwd(self, user: str, password: str) -> None:
        self._require_user(user)["pwd"] = _pwd_hash(user, password)
        self._save()

    def add_user_to_group(self, user: str, group: str) -> None:
        g = self._require_user(user)["groups"]
        if group not in g:
            g.append(group)
            self._save()

    def delete_user_from_group(self, user: str, group: str) -> None:
        g = self._require_user(user)["groups"]
        if group in g:
            g.remove(group)
            self._save()

    def _require_user(self, user: str) -> dict:
        if user not in self._state["users"]:
            raise ValueError(f"no such user: {user}")
        return self._state["users"][user]

    def check_login(self, user: str, password: str) -> bool:
        u = self._state["users"].get(user)
        return bool(u) and u["pwd"] == _pwd_hash(user, password)

    # --- table policy (table_schema.proto:57,59) ----------------------
    def set_table_policy(
        self, table: str, *, admin: str | None = None, admin_group: str | None = None
    ) -> None:
        self._state["tables"][table] = {"admin": admin, "admin_group": admin_group}
        self._save()

    def can_admin(self, user: str | None, table: str) -> bool:
        if self.policy == "none":
            return True
        pol = self._state["tables"].get(table)
        if pol is None or (pol["admin"] is None and pol["admin_group"] is None):
            return user is not None and user in self._state["users"]
        if user is None or user not in self._state["users"]:
            return False
        if pol["admin"] == user:
            return True
        return bool(
            pol["admin_group"]
            and pol["admin_group"] in self._state["users"][user]["groups"]
        )

    def authorize(self, user: str | None, action: str, table: str) -> None:
        """action: 'read' | 'write' | 'admin'. Raises AccessDenied."""
        if self.policy == "none":
            return
        if action == "admin":
            if not self.can_admin(user, table):
                raise AccessDenied(f"{user!r} cannot admin {table}")
            return
        if user is None or user not in self._state["users"]:
            raise AccessDenied(f"{user!r} is not an authenticated user")

    # --- quotas (quota.proto, quota_entry.h) --------------------------
    def set_quota(self, table: str, op: str, limit: int, period_s: int = 1) -> None:
        if op not in QUOTA_OPS:
            raise ValueError(f"unknown quota op: {op} (one of {QUOTA_OPS})")
        self._state["quotas"].setdefault(table, {})[op] = {
            "limit": int(limit),
            "period": int(period_s),
        }
        self._save()

    def del_quota(self, table: str) -> None:
        # TableQuota.kDelQuota (quota.proto:25)
        self._state["quotas"].pop(table, None)
        self._state["consumed"].pop(table, None)
        self._save()

    def show_quota(self) -> dict:
        return json.loads(json.dumps(self._state["quotas"]))

    def check_and_consume(
        self, table: str, op_amounts: list[tuple[str, int]], *, now_s: float | None = None
    ) -> None:
        """Atomic multi-op admission (QuotaEntry::CheckAndConsume,
        quota_entry.h:33): either every (op, amount) fits its window
        and all are consumed, or nothing is and QuotaExceeded raises.
        Windows are fixed periods, refilled at period boundaries (the
        limiter's per-period token grant)."""
        quotas = self._state["quotas"].get(table)
        if not quotas:
            return
        now = time.time() if now_s is None else now_s
        used = self._state["consumed"].setdefault(table, {})
        staged: dict[str, dict] = {}
        for op, amount in op_amounts:
            q = quotas.get(op)
            if q is None:
                continue
            window = int(now // q["period"]) * q["period"]
            cur = used.get(op)
            base = cur["used"] if cur and cur["window_start"] == window else 0
            prev = staged.get(op, {"used": base, "window_start": window})
            prev["used"] += int(amount)
            if prev["used"] > q["limit"]:
                raise QuotaExceeded(
                    f"{table}.{op}: {prev['used']} > {q['limit']} per {q['period']}s"
                )
            staged[op] = prev
        used.update(staged)
        self._save()

    def consume_for(
        self,
        table: str,
        action: str,
        *,
        reqs: int = 1,
        bytes_: int = 0,
        now_s: float | None = None,
    ) -> None:
        """Convenience: map read/write/scan to the reqs+bytes op pair."""
        prefix = {"write": "write", "read": "read", "scan": "scan"}[action]
        ops: list[tuple[str, int]] = [(f"{prefix}_reqs", reqs)]
        if bytes_:
            ops.append((f"{prefix}_bytes", bytes_))
        self.check_and_consume(table, ops, now_s=now_s)
