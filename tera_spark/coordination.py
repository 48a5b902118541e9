"""Coordination arbiter: exclusive expiring claims behind a seam.

Everything in the engine that must pick ONE winner among racing
processes — the writer lease, the commit-slot CAS, the seq-window
allocator lock, the opkinds/rollbacks spin locks — reduces to a
single primitive, the GENERATION-SLOT claim:

    try_claim(slot, holder, ttl)  ->  exactly one racer returns True
    state(slot)                   ->  (generation, record | None)
    release(slot, holder)         ->  conditional release
    clear_dead(slot)              ->  GC of expired/torn records

The reference delegates this exact job to ZooKeeper (src/zk/ — tablet
servers hold ZK node locks, the master fences a dead server by
deleting its node). This module is the engine's seam for that role:
``Catalog`` takes any ``SlotArbiter`` and routes every claim through
it, so the arbiter backend can change without touching commit logic.

**Shipped backend and its deployment constraint.**
``PosixLinkArbiter`` arbitrates with ``os.link`` exclusivity and
therefore requires every writer to share ONE filesystem with
POSIX-atomic hard-link creation — a local disk, NFS (link is atomic
on NFSv3+), or Lustre/GPFS-class cluster filesystems. It is proved
single-winner under 16- and 32-process takeover storms
(scripts/scale_smoke_cas.py, SCALE.md §coordination). It is NOT
correct on object stores: S3/GCS have no hard links and no atomic
rename, so a 100 TB deployment whose table root lives on an object
store must bring a different arbiter.

**What an object-store/ZK backend looks like** (the sketch the seam
is shaped for; none is shipped because no such service exists in this
environment):

* *ZooKeeper / etcd* (the reference's own choice): a slot maps to a
  ZK node path; ``try_claim`` is a create of an ephemeral node (the
  session keepalive replaces the ttl record — expiry becomes session
  loss, strictly stronger than wall-clock ttl); generations map to
  the node's czxid, monotone per re-create; ``release`` deletes the
  node guarded by a version check; ``clear_dead`` is unnecessary (ZK
  GCs ephemerals).
* *Conditional-put object store / CAS KV* (S3 If-None-Match PUT,
  GCS x-goog-if-generation-match: 0, DynamoDB conditional writes):
  a slot maps to one object key; ``try_claim`` PUTs the record with
  an if-absent precondition, takeover of an expired record uses
  if-generation-match (compare-and-swap on the generation the racer
  read) — the same "target name is the arbiter" shape with the
  store's generation number replacing the ``.g<k>`` filename suffix;
  ``clear_dead`` is a conditional DELETE on the read generation.

The conditional-put shape IS shipped, as ``CasArbiter``: the full
claim/renew/takeover/release/GC protocol written against the minimal
``CasStore`` interface (get / put_if / delete_if / keys — exactly the
four conditional operations every such service offers). A cloud
deployment implements ``CasStore`` over its service (a DynamoDB
conditional write, a GCS if-generation-match PUT) and reuses
``CasArbiter`` unchanged; the protocol is optimistic-CAS loops, never
an in-client lock, so it is correct against a REMOTE linearization
point. Two stores come with it: ``MemoryCasStore`` (one process,
thread-safe — the seam tests drive the whole lease/commit/heal
machinery through it) and ``serve_cas_store``/``connect_cas_store``,
which put a MemoryCasStore behind a socket so separate OS processes
share one linearization point — the storm harness runs the same 16/32
process takeover storm against it (``scale_smoke_cas.py storm
--arbiter cas``), which is the acceptance gate for any new store.

Either backend implements the same four methods; the storm harness
(scripts/scale_smoke_cas.py) is backend-agnostic and is the
acceptance gate for any new arbiter.

The claim-record contract all backends share: a record is a JSON dict
``{"holder": str, "expires": epoch_seconds}``; a record past
``expires`` (or unreadable/torn) is DEAD and may be taken over; slot
records are immutable once published — renewal/takeover publishes a
new generation, never rewrites — which is what makes reader-side
healing (catalog._reader_heal) race-free.
"""

from __future__ import annotations

import json
import time
from abc import ABC, abstractmethod
from pathlib import Path


class SlotArbiter(ABC):
    """Exclusive expiring claim slots. See module docstring for the
    contract; ``p`` is the slot's base path (backends that are not
    path-shaped map it to their own key space)."""

    @abstractmethod
    def try_claim(self, p: Path, holder: str, ttl_s: float, *, renew: bool = False) -> bool:
        """One attempt at the slot. True iff this call now holds it.
        A live foreign record loses; expired/torn records are taken
        over; a live record of our own holder loses unless ``renew``
        (mutual exclusion for spin-lock reuse of one writer_id)."""

    @abstractmethod
    def state(self, p: Path):
        """(generation, record | None-if-torn) of the current claim,
        or None for an empty slot."""

    @abstractmethod
    def release(self, p: Path, holder: str) -> None:
        """Conditional release: drop the current record only while it
        still names ``holder``."""

    @abstractmethod
    def clear_dead(self, p: Path) -> None:
        """Remove every record of the slot that is expired or torn;
        never a live one (reader-heal GC)."""

    @abstractmethod
    def list_slots(self, d: Path, prefix: str) -> list[Path]:
        """Distinct slot base paths under directory ``d`` whose name
        starts with ``prefix`` (used to enumerate commit claims)."""


class PosixLinkArbiter(SlotArbiter):
    """Generation-slot claims arbitrated by ``os.link`` exclusivity.

    Requires all writers to share one POSIX filesystem where hard-link
    creation is atomic and exclusive (local disk, NFSv3+, Lustre).
    NOT for object-store table roots — see the module docstring.

    Design (round 6, unchanged here — only moved behind the seam):
    a slot is a family of immutable generation files (plain path =
    gen 0, ``<name>.g<k>`` above it); the current record is the
    highest generation. Acquire/takeover/renewal all publish
    generation ``highest+1`` by hard-linking a fully-written temp —
    the TARGET NAME is the arbiter: os.link is exclusive, so exactly
    one racer can ever create a given generation. After winning a
    name, the winner re-globs and retracts if a higher generation
    appeared (a release/cleanup race can let two racers win DIFFERENT
    generations; the higher one keeps, deterministically), then
    unlinks the superseded lower generations.

    History: round 5 arbitrated expired-claim takeover by renaming the
    dead record ASIDE and re-racing an exclusive link-create. That
    passed the two-process hammer, but the 16-process takeover storm
    (scripts/scale_smoke_cas.py storm) exposed a three-party hole:
    racer B renames winner A's FRESH claim aside (stale expired read),
    and while B verifies-and-restores, racer C's link-create wins the
    momentarily-empty slot — A and C both return True. The root cause
    is any protocol step that makes a live slot momentarily ABSENT;
    this design never renames and never rewrites.
    """

    @staticmethod
    def _slot_files(p: Path) -> list:
        """All generation files of a claim slot, sorted by generation.
        Every slot file is IMMUTABLE after creation (link-published
        with content; never rewritten), which is what makes concurrent
        reads/unlinks of dead generations safe."""
        out = []
        if p.exists():
            out.append((0, p))
        prefix = p.name + ".g"
        for f in p.parent.glob(p.name + ".g*"):
            suffix = f.name[len(prefix):]
            if suffix.isdigit():
                out.append((int(suffix), f))
        out.sort()
        return out

    def state(self, p: Path):
        """A file unlinked between glob and read (a racer's cleanup)
        falls through to the next lower generation — stale-low answers
        are tolerated because every winner re-verifies it holds the
        highest generation."""
        files = self._slot_files(p)
        while files:
            gen, f = files.pop()
            try:
                return gen, json.loads(f.read_text())
            except FileNotFoundError:
                continue
            except (OSError, json.JSONDecodeError):
                return gen, None  # torn record = dead holder
        return None

    def try_claim(self, p: Path, holder: str, ttl_s: float, *, renew: bool = False) -> bool:
        import os
        import uuid

        d = p.parent
        while True:
            st = self.state(p)
            if st is None:
                target = 0
            else:
                gen, rec = st
                if rec is not None and rec.get("expires", 0) > time.time():
                    if rec.get("holder") != holder or not renew:
                        return False  # live claim (foreign, or ours sans renew)
                target = gen + 1
            tgt = p if target == 0 else d / f"{p.name}.g{target}"
            tmp = d / f"{p.name}.w-{uuid.uuid4().hex}"
            tmp.write_text(json.dumps({"holder": holder, "expires": time.time() + ttl_s}))
            try:
                os.link(str(tmp), str(tgt))
            except FileExistsError:
                continue  # someone else took this generation: re-read
            finally:
                tmp.unlink(missing_ok=True)
            files = self._slot_files(p)
            if files and files[-1][0] > target:
                # a higher generation landed concurrently (possible only
                # through a release/cleanup race): the higher wins
                tgt.unlink(missing_ok=True)
                continue
            for g, f in files:
                if g < target:
                    f.unlink(missing_ok=True)  # superseded, immutable, dead
            return True

    def release(self, p: Path, holder: str) -> None:
        """Conditional on the record naming ``holder``. A FOREIGN
        takeover record can never be deleted here: takeovers always
        publish a HIGHER generation under the taker's holder id, the
        names are create-exclusive, and this unlink targets only a
        generation whose record was read as ours. The residual
        check->unlink corner is same-holder only — a stale release
        (e.g. an old thread of this process) can delete our own newer
        renewal record — which degrades slot ORDERING only, never
        safety: seq windows come from the reservation counter and can
        never interleave, and uncommitted windows stay gap-masked."""
        st = self.state(p)
        if st is None:
            return
        gen, rec = st
        if rec is not None and rec.get("holder") == holder:
            f = p if gen == 0 else p.parent / f"{p.name}.g{gen}"
            f.unlink(missing_ok=True)

    def clear_dead(self, p: Path) -> None:
        """Safe by immutability: each unlink targets a specific file
        whose content was read as dead; a live claim (or a fresh
        takeover's new generation) is never removed."""
        now = time.time()
        for _gen, f in self._slot_files(p):
            try:
                rec = json.loads(f.read_text())
            except FileNotFoundError:
                continue
            except (OSError, json.JSONDecodeError):
                rec = None
            if rec is None or rec.get("expires", 0) <= now:
                f.unlink(missing_ok=True)

    def list_slots(self, d: Path, prefix: str) -> list[Path]:
        """Base paths of every slot whose plain file OR any generation
        file exists (a slot can be visible only through a ``.g<k>``)."""
        if not d.exists():
            return []
        bases = set()
        for p in d.glob(f"{prefix}*"):
            n = p.name
            if ".g" in n:
                stem, _, suffix = n.rpartition(".g")
                if suffix.isdigit() and stem.startswith(prefix):
                    bases.add(stem)
                    continue
            if n.startswith(prefix) and ".w-" not in n:
                bases.add(n)
        return [d / b for b in sorted(bases)]


# --------------------------------------------------------------------------
# conditional-put backend (the cloud shape)
# --------------------------------------------------------------------------


class CasStore(ABC):
    """The minimal service boundary a conditional-put arbiter needs —
    the four operations every CAS-capable store offers (DynamoDB
    conditional writes, GCS if-generation-match, etcd txn, S3
    If-None-Match). Keys are opaque strings; values are opaque strings;
    the GENERATION is the store's own monotone version for a key and is
    the only thing preconditions compare. Implementations must make
    each method atomic against the store's linearization point (a
    remote service call, a locked map, one SQL statement) — the arbiter
    on top never holds a client-side lock.

    REQUIRED: generations must be monotone for a key ACROSS
    delete/recreate, never just within one key lifetime. If a
    recreated key can reuse a prior generation, the arbiter's takeover
    CAS is ABA-vulnerable: a racer holding a stale (gen, dead-record)
    snapshot could overwrite a fresh claim that happens to land on the
    same generation number. GCS object generations satisfy this
    natively; a DynamoDB version-attribute scheme must persist a
    tombstone (or derive the version from a monotone source) rather
    than start recreated items back at 0."""

    @abstractmethod
    def get(self, key: str):
        """(generation, value) or None for an absent key."""

    @abstractmethod
    def put_if(self, key: str, value: str, if_gen: int | None) -> bool:
        """Write iff the precondition holds: ``if_gen=None`` means the
        key must be ABSENT (If-None-Match / attribute_not_exists);
        otherwise the key's current generation must equal ``if_gen``
        (if-generation-match). A successful put bumps the generation."""

    @abstractmethod
    def delete_if(self, key: str, if_gen: int) -> bool:
        """Delete iff the key's current generation equals ``if_gen``."""

    @abstractmethod
    def keys(self, prefix: str) -> list:
        """Sorted keys with the given prefix (DynamoDB Query /
        GCS list with prefix)."""


class MemoryCasStore(CasStore):
    """Linearizable conditional-put KV inside one process: the lock is
    the linearization point. Drives the seam tests and is the template
    a remote store copies — every method is one atomic round-trip.

    Generations are monotone across delete/recreate (the ABC's ABA
    requirement): ``_last_gen`` remembers the highest generation a key
    ever held, and an absent-create resumes at last+1 instead of 0, so
    a stale ``put_if(if_gen=old)`` can never succeed against a key
    that was deleted and re-claimed in between."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._kv: dict = {}
        self._last_gen: dict = {}

    def get(self, key: str):
        with self._lock:
            return self._kv.get(key)

    def put_if(self, key: str, value: str, if_gen: int | None) -> bool:
        with self._lock:
            cur = self._kv.get(key)
            if if_gen is None:
                if cur is not None:
                    return False
                gen = self._last_gen.get(key, -1) + 1
            else:
                if cur is None or cur[0] != if_gen:
                    return False
                gen = if_gen + 1
            self._kv[key] = (gen, value)
            self._last_gen[key] = gen
            return True

    def delete_if(self, key: str, if_gen: int) -> bool:
        with self._lock:
            cur = self._kv.get(key)
            if cur is None or cur[0] != if_gen:
                return False
            # _last_gen survives the delete — that tombstone is what
            # keeps generations monotone when the key is re-created
            del self._kv[key]
            return True

    def keys(self, prefix: str) -> list:
        with self._lock:
            return sorted(k for k in self._kv if k.startswith(prefix))


def serve_cas_store(authkey: bytes = b"tera-cas"):
    """Put a MemoryCasStore behind a localhost socket so SEPARATE OS
    processes share one linearization point — the stand-in for the
    remote service a cloud deployment would call. Returns
    ``(manager, address)``; pass the address (host, port) and authkey
    to ``connect_cas_store`` in each client process. Shut down with
    ``manager.shutdown()``."""
    from multiprocessing.managers import BaseManager

    store = MemoryCasStore()

    class _Mgr(BaseManager):
        pass

    _Mgr.register("store", callable=lambda: store)
    mgr = _Mgr(address=("127.0.0.1", 0), authkey=authkey)
    mgr.start()
    return mgr, mgr.address


def connect_cas_store(address, authkey: bytes = b"tera-cas") -> CasStore:
    """Client side of ``serve_cas_store``: every get/put_if/delete_if
    is an RPC the server applies atomically — the same trust shape as
    a DynamoDB conditional write."""
    from multiprocessing.managers import BaseManager

    class _Mgr(BaseManager):
        pass

    _Mgr.register("store")
    mgr = _Mgr(address=tuple(address), authkey=authkey)
    mgr.connect()
    return mgr.store()


class CasArbiter(SlotArbiter):
    """Generation-slot claims over any ``CasStore`` — the shipped
    conditional-put backend (promoted from the round-7 seam test).

    The protocol is optimistic: read the slot, decide, then write with
    the read generation as the precondition. A lost CAS means a racer
    moved first — re-read and re-decide; exactly one racer's
    precondition can hold per generation, which is the single-winner
    argument (the store's version check replaces PosixLinkArbiter's
    exclusive os.link). No step ever makes a live slot absent, the
    invariant the round-6 storm taught (coordination.py history note).

    Slot base paths map to string keys verbatim, one key per slot —
    the store's generation plays the role the ``.g<k>`` filename
    suffix plays on POSIX, so there are no per-generation keys to GC.
    """

    def __init__(self, store: CasStore):
        self.store = store

    @staticmethod
    def _parse(raw: str):
        try:
            return json.loads(raw)
        except (ValueError, TypeError):
            return None  # torn record = dead holder

    def state(self, p: Path):
        cur = self.store.get(str(p))
        if cur is None:
            return None
        gen, raw = cur
        return gen, self._parse(raw)

    def try_claim(self, p: Path, holder: str, ttl_s: float, *, renew: bool = False) -> bool:
        key = str(p)
        while True:
            rec = json.dumps({"holder": holder, "expires": time.time() + ttl_s})
            cur = self.store.get(key)
            if cur is None:
                if self.store.put_if(key, rec, None):
                    return True
                continue  # lost the empty-slot race: re-read, re-decide
            gen, raw = cur
            r = self._parse(raw)
            if r is not None and r.get("expires", 0) > time.time():
                if r.get("holder") != holder or not renew:
                    return False  # live claim (foreign, or ours sans renew)
            if self.store.put_if(key, rec, gen):
                return True
            # takeover CAS lost: someone else claimed this generation

    def release(self, p: Path, holder: str) -> None:
        cur = self.store.get(str(p))
        if cur is None:
            return
        gen, raw = cur
        r = self._parse(raw)
        if r is not None and r.get("holder") == holder:
            # generation-guarded: if the holder renewed concurrently the
            # precondition fails and the newer record survives — the
            # same-holder stale-release corner PosixLinkArbiter documents
            # is CLOSED here by the version check
            self.store.delete_if(str(p), gen)

    def clear_dead(self, p: Path) -> None:
        cur = self.store.get(str(p))
        if cur is None:
            return
        gen, raw = cur
        r = self._parse(raw)
        if r is None or r.get("expires", 0) <= time.time():
            self.store.delete_if(str(p), gen)

    def list_slots(self, d: Path, prefix: str) -> list[Path]:
        base = str(d)
        if not base.endswith("/"):
            base += "/"
        out = []
        for k in self.store.keys(base + prefix):
            kp = Path(k)
            if kp.parent == Path(str(d)):
                out.append(kp)
        return out
