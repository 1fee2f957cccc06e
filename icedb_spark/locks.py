"""Pluggable exclusive-lock providers for multi-node maintenance.

The reference engine REQUIRES an external exclusive lock around merge /
tombstone_cleanup when more than one node may run them
(/root/reference/ARCHITECTURE.md:115-117, README.md:600-616) but leaves
acquiring it entirely to the caller. ``IceTable(lock_provider=...)``
turns that documented contract into an enforceable one: a provider is
any callable ``op_name -> context manager``; the table holds the
returned context for the whole maintenance operation (reentrantly, so
``optimize -> merge_all -> merge`` acquires once).

``file_lock_provider`` below covers shared-POSIX-filesystem deployments
(NFS caveat: flock over NFS needs a lock-supporting mount).
``s3_lock_provider`` covers PURE object-store deployments with no shared
filesystem and no extra service: an S3 conditional-write lease (PUT
``If-None-Match: *`` to create, PUT ``If-Match: <etag>`` to renew/steal
— both public S3 API since 2024) with TTL expiry and a monotonic
fencing token. Anything else exposing ``__enter__``/``__exit__`` with
exclusive semantics (DynamoDB lease, ZooKeeper/etcd, Postgres advisory
lock) has the right shape too.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import os
import socket
import threading
import time
import urllib.error
import urllib.request
from contextlib import contextmanager
from datetime import datetime, timezone
from typing import Callable, ContextManager, Optional
from urllib.parse import quote


def file_lock_provider(
    lock_path: str, timeout_s: float = 600.0
) -> Callable[[str], ContextManager]:
    """An exclusive-lock provider backed by ``fcntl.flock`` on one shared
    file — correct across PROCESSES on the same host or a shared
    filesystem with working flock. Blocks until acquired (kernel-fair),
    raising ``TimeoutError`` after ``timeout_s`` so a dead peer holding
    an advisory lock cannot hang maintenance forever (flock dies with
    its holder's fd, so the timeout only fires under real contention).
    """
    import fcntl

    @contextmanager
    def acquire(op: str):
        d = os.path.dirname(lock_path)
        if d:
            os.makedirs(d, exist_ok=True)
        f = open(lock_path, "a+")
        try:
            _flock_with_timeout(f, fcntl, timeout_s, op)
            yield
        finally:
            try:
                fcntl.flock(f, fcntl.LOCK_UN)
            finally:
                f.close()

    return acquire


def _flock_with_timeout(f, fcntl, timeout_s: float, op: str) -> None:
    import time

    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return
        except OSError:
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"could not acquire maintenance lock for {op!r} "
                    f"within {timeout_s}s (held by another process?)"
                )
            time.sleep(0.05)


# --------------------------------------------------------------- S3 lease


class _SigV4S3:
    """Tiny stdlib S3 client speaking exactly the four verbs the lease
    needs (GET/PUT/DELETE + conditional headers), with real AWS
    Signature Version 4 signing (the public algorithm: HMAC key
    derivation date/region/service/aws4_request over a canonical
    request) so the provider works against real S3/MinIO, not just the
    test server. Path-style addressing; payloads are tiny JSON so the
    content hash is the real SHA-256, never UNSIGNED-PAYLOAD."""

    def __init__(
        self,
        endpoint: str,
        bucket: str,
        access_key: str,
        secret_key: str,
        region: str = "us-east-1",
    ):
        self.endpoint = endpoint.rstrip("/")
        self.bucket = bucket
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.host = self.endpoint.split("://", 1)[1]

    def _sign(self, method: str, key: str, body: bytes, extra: dict) -> dict:
        now = datetime.now(timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        datestamp = now.strftime("%Y%m%d")
        payload_hash = hashlib.sha256(body).hexdigest()
        canonical_uri = quote(f"/{self.bucket}/{key}")
        headers = {
            "host": self.host,
            "x-amz-content-sha256": payload_hash,
            "x-amz-date": amz_date,
        }
        signed_names = ";".join(sorted(headers))
        canonical_headers = "".join(
            f"{k}:{headers[k]}\n" for k in sorted(headers)
        )
        canonical_request = "\n".join(
            [method, canonical_uri, "", canonical_headers, signed_names,
             payload_hash]
        )
        scope = f"{datestamp}/{self.region}/s3/aws4_request"
        string_to_sign = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                amz_date,
                scope,
                hashlib.sha256(canonical_request.encode()).hexdigest(),
            ]
        )

        def _hmac(k: bytes, msg: str) -> bytes:
            return hmac.new(k, msg.encode(), hashlib.sha256).digest()

        k = _hmac(f"AWS4{self.secret_key}".encode(), datestamp)
        k = _hmac(k, self.region)
        k = _hmac(k, "s3")
        k = _hmac(k, "aws4_request")
        signature = hmac.new(
            k, string_to_sign.encode(), hashlib.sha256
        ).hexdigest()
        out = {
            "x-amz-content-sha256": payload_hash,
            "x-amz-date": amz_date,
            "Authorization": (
                f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
                f"SignedHeaders={signed_names}, Signature={signature}"
            ),
        }
        out.update(extra)
        return out

    def request(
        self, method: str, key: str, body: bytes = b"", extra: Optional[dict] = None
    ) -> tuple:
        """-> (status, etag, body). 404/412/409 return as statuses (the
        lease protocol branches on them — real S3 answers concurrent
        conditional writes with 409 ConditionalRequestConflict, the
        exact contention the lease exists for, so it must read as a
        lost CAS, not an exception); other HTTP errors raise."""
        url = f"{self.endpoint}/{self.bucket}/{quote(key)}"
        req = urllib.request.Request(
            url, data=body if method == "PUT" else None, method=method
        )
        for k, v in self._sign(method, key, body, extra or {}).items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                return (
                    resp.status,
                    (resp.headers.get("ETag") or "").strip('"'),
                    resp.read(),
                )
        except urllib.error.HTTPError as e:
            if e.code in (404, 409, 412):
                return e.code, "", b""
            raise


class LockLostError(RuntimeError):
    """Raised when a maintenance commit is refused because the holder's
    lease was stolen or expired mid-operation (the fencing check)."""


class Lease(int):
    """The value an :func:`s3_lock_provider` context yields: the lease's
    monotonic fencing token, usable anywhere an ``int`` is (compare,
    persist, stamp into log metadata), plus the liveness interface the
    engine's commit-time fencing check calls:

    * ``lease.lost`` — cheap local flag, set by the renewal thread the
      moment a renewal CAS fails (lease stolen/expired under us).
    * ``lease.verify()`` — the strong check: one GET of the lock object
      comparing its etag against our last successful renewal, raising
      :class:`LockLostError` if the lease is no longer ours. Closes the
      window where a paused holder resumes BEFORE its next renewal tick
      would have noticed the steal.
    """

    def __new__(cls, token: int, state: dict, check: Callable[[], bool]):
        self = super().__new__(cls, token)
        self._state = state
        self._check = check
        return self

    @property
    def lost(self) -> bool:
        return bool(self._state.get("lost"))

    def verify(self) -> None:
        if self.lost or not self._check():
            self._state["lost"] = True
            raise LockLostError(
                f"maintenance lease lost (fencing token {int(self)}): "
                "another holder owns the lock — aborting before commit"
            )


def s3_lock_provider(
    bucket: str,
    key: str,
    *,
    endpoint_override: Optional[str] = None,
    access_key: Optional[str] = None,
    secret_key: Optional[str] = None,
    region: str = "us-east-1",
    ttl_s: float = 300.0,
    timeout_s: float = 600.0,
    poll_s: float = 0.25,
    holder: Optional[str] = None,
) -> Callable[[str], ContextManager]:
    """An exclusive-lock provider leased on ONE S3 object — the
    object-store-native answer to the reference's multi-node merge
    contract (/root/reference/ARCHITECTURE.md:115-117: merge /
    tombstone_cleanup need an external exclusive lock) for deployments
    with no shared filesystem and no lock service.

    Protocol (every mutation is an atomic conditional write — S3's
    compare-and-swap, public API since 2024):

    * ACQUIRE: ``PUT If-None-Match: *`` of a JSON lease
      ``{holder, op, token, expires_at}`` — succeeds only when no lock
      object exists. On 412, read the current lease; if its
      ``expires_at`` has passed, STEAL with ``PUT If-Match: <etag>``
      (only one of N racing stealers can win the CAS; a renewed or
      re-acquired lease changes the etag and fails the rest). Otherwise
      poll until ``timeout_s``, then raise ``TimeoutError``.
    * RENEW: a daemon thread re-PUTs the lease (``If-Match`` on our own
      etag) every ``ttl_s / 3``, so a live holder keeps the lock for
      operations longer than the TTL while a CRASHED holder's lease
      expires and gets stolen — the flock-dies-with-its-holder analog.
    * RELEASE: marker write + DELETE only while our etag is still
      current (checked via GET; S3 has no conditional DELETE) — a
      holder that lost its lease touches NOTHING on release (the
      stealer's live lease/marker carries a higher token). The
      check-then-delete window is benign: it only matters after our
      lease already expired AND a stealer won, in which case the TTL
      contract was already broken and the stealer's next renewal
      re-creates its lease.
    * FENCING: each acquisition writes ``token = prior token + 1``
      (monotonic across holders, persisted in the lease body and in a
      sibling ``<key>.token`` high-water object merged with
      ``max(existing, token)`` under an If-Match CAS on release, so
      expiry/steal cycles never reuse a token even against delayed
      releases). The context YIELDS a :class:`Lease` (an ``int``
      token with ``lost`` / ``verify()``) and the engine ENFORCES it:
      every maintenance commit calls ``verify()`` immediately before
      its atomic log PUT and aborts with :class:`LockLostError` when
      the lease is no longer ours — the standard guard against a
      paused-then-resumed process acting on a lost lock.

    Credential naming matches the engine's pyarrow ``storage_options``
    (``access_key``, ``secret_key``, ``endpoint_override``, ``region``);
    unset values fall back to ``AWS_ACCESS_KEY_ID`` /
    ``AWS_SECRET_ACCESS_KEY`` / ``AWS_ENDPOINT_URL`` env vars. Clock
    caveat: expiry is judged by the STEALER's clock, so keep ``ttl_s``
    well above worst-case clock skew plus renewal jitter.
    """
    endpoint = endpoint_override or os.environ.get("AWS_ENDPOINT_URL") or (
        f"https://s3.{region}.amazonaws.com"
    )
    client = _SigV4S3(
        endpoint,
        bucket,
        access_key or os.environ.get("AWS_ACCESS_KEY_ID", ""),
        secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY", ""),
        region,
    )
    who = holder or f"{socket.gethostname()}-{os.getpid()}"

    def _lease_body(op: str, token: int) -> bytes:
        return json.dumps(
            {
                "holder": who,
                "op": op,
                "token": token,
                "expires_at": time.time() + ttl_s,
            }
        ).encode()

    def _next_token() -> int:
        # highest token ever observed: the live lease, else the release
        # marker (so release->reacquire cycles stay monotonic)
        best = 0
        for k in (key, key + ".token"):
            st, _e, body = client.request("GET", k)
            if st == 200:
                try:
                    best = max(best, int(json.loads(body)["token"]))
                except (ValueError, KeyError, json.JSONDecodeError):
                    pass
        return best + 1

    @contextmanager
    def acquire(op: str):
        deadline = time.monotonic() + timeout_s
        etag: Optional[str] = None
        token = 0
        while etag is None:
            st, cur_etag, body = client.request("GET", key)
            if st == 404:
                token = _next_token()
                st2, e2, _ = client.request(
                    "PUT", key, _lease_body(op, token),
                    {"If-None-Match": "*"},
                )
                if st2 == 200:
                    etag = e2
                    continue
            elif st == 200:
                try:
                    cur = json.loads(body)
                except json.JSONDecodeError:
                    cur = {"expires_at": 0, "token": 0}
                if float(cur.get("expires_at", 0)) <= time.time():
                    token = int(cur.get("token", 0)) + 1
                    st2, e2, _ = client.request(
                        "PUT", key, _lease_body(op, token),
                        {"If-Match": cur_etag},
                    )
                    if st2 == 200:
                        etag = e2
                        continue
            if time.monotonic() >= deadline:
                raise TimeoutError(
                    f"could not acquire s3 lease s3://{bucket}/{key} for "
                    f"{op!r} within {timeout_s}s (held by another process?)"
                )
            time.sleep(poll_s)

        stop = threading.Event()
        state = {"etag": etag, "lost": False}
        # serializes each renewal's PUT + etag assignment against
        # still_ours()'s GET + compare: without it, a verify() landing
        # between the server installing the renewal's new etag and the
        # thread recording it would see new != recorded and latch a
        # SPURIOUS LockLostError on a perfectly healthy lease (aborting
        # the commit AND skipping release's marker/DELETE)
        mu = threading.Lock()

        def renew_loop():
            while not stop.wait(max(ttl_s / 3.0, 0.05)):
                with mu:
                    try:
                        st2, e2, _ = client.request(
                            "PUT", key, _lease_body(op, token),
                            {"If-Match": state["etag"]},
                        )
                    except Exception:
                        # transient network error / S3 5xx: the lease
                        # may well still be ours — keep trying until
                        # stop or a DEFINITIVE protocol answer says
                        # otherwise (dying here would silently stop
                        # renewals and hand the lock to a stealer at
                        # TTL)
                        continue
                    if st2 == 200:
                        state["etag"] = e2
                    else:  # definitive 404/409/412: stolen/expired
                        state["lost"] = True
                        return

        def still_ours() -> bool:
            with mu:
                try:
                    st2, cur_etag, _ = client.request("GET", key)
                except Exception:
                    # indeterminate: trust renewals
                    return not state["lost"]
                return st2 == 200 and cur_etag == state["etag"]

        def write_marker_max() -> None:
            # merge the high-water marker with max(existing, token) under
            # a CAS loop, so a delayed release can never REGRESS the
            # marker below a later holder's token (which would let
            # _next_token re-mint that token)
            for _ in range(8):
                st2, metag, body = client.request("GET", key + ".token")
                prev = -1
                if st2 == 200:
                    try:
                        prev = int(json.loads(body)["token"])
                    except (ValueError, KeyError, json.JSONDecodeError):
                        prev = -1
                if prev >= token:
                    return
                payload = json.dumps({"token": token}).encode()
                cond = (
                    {"If-Match": metag} if st2 == 200
                    else {"If-None-Match": "*"}
                )
                st3, _, _ = client.request(
                    "PUT", key + ".token", payload, cond
                )
                if st3 == 200:
                    return

        thr = threading.Thread(target=renew_loop, daemon=True)
        thr.start()
        try:
            yield Lease(token, state, still_ours)
        finally:
            stop.set()
            thr.join(timeout=5)
            # high-water marker + lease delete ONLY while the lease is
            # still ours — a holder that lost its lease must not touch
            # either (the stealer's live lease/marker carries a HIGHER
            # token; writing ours would regress the fencing sequence)
            if not state["lost"] and still_ours():
                write_marker_max()
                st2, cur_etag, _ = client.request("GET", key)
                if st2 == 200 and cur_etag == state["etag"]:
                    client.request("DELETE", key)

    return acquire
