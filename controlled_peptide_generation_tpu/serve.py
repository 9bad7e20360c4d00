"""Production serving layer over the fused CLaSS sampler.

The reference has no serving story — its `sample_pipeline.py` is a batch
job that writes CSVs (reference sample_pipeline.py:236-326). This module
turns the same machinery into a long-lived service: one process owns the
trained model, the fitted Q(z|a) density and the latent attribute
classifiers, and answers "give me N accepted peptides" requests from many
concurrent clients.

Design (TPU-first, same principles as the batch pipeline):

* ONE worker thread owns the device. JAX dispatch is not thread-safe to
  interleave arbitrarily, and a single stream of fused rounds keeps the
  chip at full occupancy anyway — concurrency is coalesced into DEMAND,
  not into parallel device work.
* Demand coalescing: all outstanding requests share one accepted-sample
  buffer. The worker sizes its next fused round to the total outstanding
  demand (minimum one round), so ten concurrent n=100 requests cost the
  same device time as one n=1000 request. Each accepted, deduped sample
  is handed to exactly one request (FIFO).
* The device work is `pipeline.launch_round` — the identical fused
  program the batch pipeline runs (rejection + accepted-compaction +
  beam decode in one dispatch), including `hw.decode_mode=accepted` and
  mesh sharding. The serving layer adds zero device code.
* Dedup is global across the server's lifetime (`pipeline.canonical_keys`
  token canonicalization), so a client can never receive a peptide the
  server already served — the batch pipeline's uniqueness contract,
  extended to the stream.

The HTTP front-end is stdlib-only (ThreadingHTTPServer): POST /generate
{"n": 10} blocks until n samples are ready and returns peptides with
their acceptance scores and physicochemistry; GET /healthz and /stats
report liveness and throughput counters. `python serve.py` (repo root)
wires it to a trained run directory with the same flags as
sample_pipeline.py.
"""

import json
import logging
import threading
import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from . import pipeline
from .evals.peptide_evals import modlamp_from_tokens

LOG = logging.getLogger("GenerationServer")


class _Request:
    """One client's outstanding demand: filled by the worker, waited on by
    the client thread. ``failed`` marks a request cancelled by stop() so
    generate() raises instead of returning a short row list."""

    __slots__ = ("n", "rows", "event", "failed")

    def __init__(self, n):
        self.n = n
        self.rows = []
        self.event = threading.Event()
        self.failed = False


class GenerationServer:
    """Coalescing generation service over fused CLaSS rounds.

    Construct with the same objects `pipeline.run` builds (model, params,
    dataset, fitted Q with attribute classifiers), or via
    :func:`build_server` to load them from a trained run directory.
    """

    def __init__(self, cfg, model, params, dataset, Q, round_size=5000,
                 mesh=None, seed=None):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.dataset = dataset
        self.Q = Q
        self.round_size = int(round_size)
        self.mesh = mesh
        self._key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        self._seen = set()
        self._queue = deque()          # FIFO of _Request
        # unique accepted rows nobody consumed (a timed-out request's
        # partial fill): handed to the next request before new rounds run,
        # so globally-deduped peptides are never permanently unservable
        self._spare = deque()
        # transformer family: cap per-dispatch candidates to the same
        # KV-cache lane budget pipeline.run enforces — without it a burst
        # of demand can pull a 4x round that compile-OOMs the server
        self._max_candidates = pipeline.transformer_dispatch_budget(
            cfg, model, n_dp=1 if mesh is None else mesh.devices.size)
        self._lock = threading.Lock()
        self._wake = threading.Condition(self._lock)
        self._running = False
        self._worker = None
        self._round_ix = 0
        self._canary_tripped = False
        # in-flight bounded rounds (worker loop): enough to hide readback
        # + host postproc behind device work, small enough that a fresh
        # request never waits behind a deep queue of stale rounds
        self._depth = max(int(cfg.hw.get("rounds_in_flight", 2)), 1) + 1
        self.stats = {"rounds": 0, "candidates": 0, "accepted": 0,
                      "served": 0, "duplicates": 0, "device_s": 0.0,
                      "started_at": None}

    # -- lifecycle ---------------------------------------------------------

    def start(self):
        assert self._worker is None, "already started"
        self._running = True
        self.stats["started_at"] = time.time()
        self._worker = threading.Thread(target=self._worker_loop,
                                        name="class-rounds", daemon=True)
        self._worker.start()
        return self

    def stop(self, timeout=60):
        with self._wake:
            self._running = False
            self._wake.notify_all()
        if self._worker is not None:
            self._worker.join(timeout)
            self._worker = None
        # cancel any requests still waiting: mark failed so generate()
        # raises instead of returning a short row list as success
        with self._lock:
            while self._queue:
                req = self._queue.popleft()
                req.failed = True
                req.event.set()

    # -- client API ---------------------------------------------------------

    def generate(self, n, timeout=None):
        """Block until n accepted, globally-unique peptides are available;
        returns a list of row dicts (peptide, scores, physchem). Raises
        TimeoutError on timeout, RuntimeError if the server stops before
        the request completes, ValueError on a non-positive n."""
        n = int(n)
        if n <= 0:
            raise ValueError(f"n must be positive, got {n}")
        req = _Request(n)
        with self._wake:
            if not self._running:
                raise RuntimeError("server not running")
            self._queue.append(req)
            self._wake.notify_all()
        if not req.event.wait(timeout):
            with self._lock:
                try:
                    self._queue.remove(req)
                    # recycle the partial fill: these rows are already
                    # globally deduped, so dropping them would make those
                    # peptides permanently unservable
                    self._spare.extend(req.rows)
                    req.rows = []
                except ValueError:
                    pass  # worker completed it between wait() and here
            if not req.event.is_set():
                raise TimeoutError(
                    f"generate({n}) timed out after {timeout}s "
                    f"(0 of {n} delivered; partial fill recycled)")
        if req.failed:
            raise RuntimeError(
                f"server stopped with generate({n}) incomplete "
                f"({len(req.rows)} of {n} ready)")
        return req.rows

    # -- worker --------------------------------------------------------------

    def _outstanding(self):
        return sum(r.n - len(r.rows) for r in self._queue)

    def _distribute_locked(self, rows):
        """Hand rows to queued requests FIFO (caller holds the lock).
        Undelivered rows go to the spare buffer instead of being dropped:
        they are already in the global dedup set. 'served' counts only
        COMPLETED requests (a timed-out request's recycled rows would
        otherwise inflate throughput stats)."""
        for i, row in enumerate(rows):
            if not self._queue:
                self._spare.extend(rows[i:])
                return
            req = self._queue[0]
            req.rows.append(row)
            if len(req.rows) >= req.n:
                self.stats["served"] += req.n
                self._queue.popleft()
                req.event.set()

    def _worker_loop(self):
        """Overlapped BOUNDED-round loop.

        The device path (pipeline.launch_round) is one asynchronous jax
        dispatch, so the worker keeps a small queue of rounds in flight
        while it pays for the oldest round's readback + host postproc
        (dedup, detokenize, physchem). Every round is at most ONE
        round_size of candidates: big backlogs are covered by MORE rounds
        in flight (up to hw.rounds_in_flight + 1), never by a bigger
        round — a request arriving mid-burst waits behind at most one
        bounded round instead of a 4x backlog round. That is the p99
        lever (round-4 load test: p50 0.265s but p99 5.49s, every late
        request riding a whole backlog round); throughput is preserved
        because the in-flight queue keeps the device saturated exactly
        like the old single big pre-dispatch did. Over-yield lands in the
        spare buffer (already globally deduped) and serves future
        demand."""
        inflight = deque()
        while True:
            with self._wake:
                while True:
                    # recycled rows (timed-out requests' partial fills)
                    # satisfy queued demand without any device work
                    if self._spare and self._queue:
                        spare, self._spare = list(self._spare), deque()
                        self._distribute_locked(spare)
                    if not self._running:
                        return
                    if self._outstanding() > 0 or inflight:
                        break
                    self._wake.wait()
                demand = self._outstanding()
                # snapshot the observed rates under the SAME lock the
                # demand was read under, so the sizing decision is
                # internally consistent even while _finish_round updates
                # stats from a previous overlapped round
                rates = self._rates_locked()
            cur = None
            try:
                # top up the in-flight queue: bounded rounds until their
                # combined expected unique yield covers the demand or the
                # depth cap is hit. Deliberately NO sizing headroom (the
                # old unbounded-round design multiplied demand by 2/acc):
                # if the rate estimate proves optimistic the NEXT loop
                # iteration tops up again, and that extra bounded round
                # overlaps the current one through the in-flight queue —
                # the p99 contract (never wait behind a round bigger than
                # round_size) stays intact either way
                expected = sum(self._expected_yield(n, rates)
                               for (n, _, _) in inflight)
                while len(inflight) < self._depth and (
                        not inflight or expected < demand):
                    n = self._round_size_bounded()
                    inflight.append(self._launch_guarded(n))
                    expected += self._expected_yield(n, rates)
                cur = inflight.popleft()
                rows = self._finish_round(cur)
                if self._canary_tripped:
                    # the pre-dispatched rounds ran the suspect Pallas
                    # program too; drop them and relaunch on the XLA arm
                    self._canary_tripped = False
                    inflight.clear()
            except Exception as e:
                # _launch_guarded retries dispatch-time OOMs itself; what
                # reaches here is an EXECUTION-time failure (surfacing at
                # block_until_ready in _finish_round) or an unrecoverable
                # dispatch error. An execution OOM gets the same
                # halve-and-retry backstop as the dispatch path; anything
                # else fails every queued request loudly instead of
                # leaving clients hanging on a dead worker thread.
                n_round = (cur[0] if cur is not None
                           else inflight[0][0] if inflight else None)
                inflight.clear()
                if pipeline.is_device_oom(e) and n_round is not None:
                    shrink = n_round // 2
                    if self.mesh is not None:
                        shrink -= shrink % self.mesh.devices.size
                    if shrink >= 1:
                        LOG.warning(
                            "execution OOM at %d candidates; capping "
                            "rounds at %d and retrying", n_round, shrink)
                        self._max_candidates = shrink
                        continue
                LOG.exception(
                    "fatal error in round worker; failing %d queued "
                    "requests", len(self._queue))
                self._fail_all(e)
                return
            with self._wake:
                self._distribute_locked(rows)

    def _fail_all(self, exc):
        """Fatal-error teardown: stop accepting work and fail every queued
        request so clients raise instead of waiting forever (stop() does
        the same for an orderly shutdown)."""
        with self._wake:
            self._running = False
            self.stats["fatal_error"] = f"{type(exc).__name__}: {exc}"
            while self._queue:
                req = self._queue.popleft()
                req.failed = True
                req.event.set()
            self._wake.notify_all()

    def _rates_locked(self):
        """(acceptance rate, unique-after-dedup rate) with conservative
        floors before any data. Caller holds the lock."""
        acc = self.stats["accepted"] / max(self.stats["candidates"], 1)
        uniq = 1.0 - (self.stats["duplicates"]
                      / max(self.stats["accepted"], 1))
        return max(acc, 0.05), max(uniq, 0.1)

    def _expected_yield(self, n, rates):
        """Expected unique accepted rows from an in-flight round of n
        candidates, from the locked-snapshot acceptance/unique rates."""
        acc, uniq = rates
        return n * acc * uniq

    def _round_size_bounded(self):
        """Candidate count for the next fused round: exactly ONE
        round_size — the p99 contract: a request never waits behind a
        round bigger than round_size; bursts are covered by MORE bounded
        rounds in flight (_worker_loop), and the single round shape keeps
        the jit cache to one compiled entry. For the transformer family
        the round is capped to the same KV-cache lane budget pipeline.run
        enforces (pipeline.transformer_dispatch_budget) so a dispatch
        can't compile-OOM the server."""
        n = self.round_size
        cap = self._max_candidates
        if cap is not None and n > cap:
            n = max((cap // self.round_size) * self.round_size,
                    min(cap, self.round_size))
            if self.mesh is not None:
                # dp_fused_round asserts n % n_dev == 0 — a budget too
                # small for one mesh-divisible round is a config error,
                # not something to paper over with a crashing fallback
                nd = self.mesh.devices.size
                n -= n % nd
                if n < 1:
                    raise ValueError(
                        f"hw.tfm_lane_budget_gb caps rounds at {cap} "
                        f"candidates, below one per mesh device ({nd}); "
                        f"raise the budget or shrink the mesh")
            n = max(n, 1)
        return n

    def _launch_guarded(self, n):
        """Dispatch one fused round asynchronously; returns (n, t_launch,
        device outputs) for _finish_round. Lane-budget backstop mirrors
        the batch loop's self-correcting clamp
        (pipeline._fused_sampling_loop): halve and retry on a compile OOM
        instead of killing the worker thread."""
        self._round_ix += 1
        t0 = time.perf_counter()
        while True:
            try:
                out = pipeline.launch_round(
                    self.cfg, self.model, self.params, self.Q, n,
                    jax.random.fold_in(self._key, self._round_ix),
                    fused=True, mesh=self.mesh)
                # pack the round's host-bound outputs into ONE int32
                # device buffer (+ one scalar) and start their D2H
                # copies NOW: the tunnel's D2H has a large FIXED cost
                # per transfer (~0.5-1.3 s measured), so five per-array
                # fetches per bounded round serialized into 12.25 s of
                # wall for ~2 s of device work in the 5-round load
                # test; packing + async copies cut it to two transfers
                # per round that overlap the next rounds' device time.
                # Same lesson as pipeline._fused_sampling_loop, taken
                # one step further for the latency-bound serving path.
                out = self._pack_round(out)
                for leaf in out[1:3]:
                    if hasattr(leaf, "copy_to_host_async"):
                        leaf.copy_to_host_async()
                return n, t0, out
            except Exception as e:
                oom = pipeline.is_device_oom(e)
                shrink = n // 2
                if self.mesh is not None:
                    shrink -= shrink % self.mesh.devices.size
                if not oom or shrink < 1:
                    raise
                LOG.warning("round OOM at %d candidates; retrying at %d",
                            n, shrink)
                self._max_candidates = n = shrink

    def _pack_round(self, out):
        """Device-side packing of a launched round's host-bound outputs:
        ("packed", main int32 [rows, T + has_valid + n_scores],
        n_candidates+n_accepted scalars [2] i32, score_keys, has_valid).
        Scores ride as bitcast int32 columns (exact). z and idx are
        never read by the server and stay on device."""
        z, scores, accept, tokens, _idx, valid = out
        keys = sorted(scores)

        # column 0..T-1: tokens; column T: keep-flag (the compacted
        # valid mask in accepted-only mode, the accept mask in
        # decode-all — either way "rows a client may receive");
        # remaining columns: one bitcast f32 score per key
        flag = accept if valid is None else valid
        cols = [jnp.asarray(tokens, jnp.int32),
                jnp.asarray(flag, jnp.int32)[:, None]]
        for k in keys:
            cols.append(jax.lax.bitcast_convert_type(
                jnp.asarray(scores[k], jnp.float32), jnp.int32)[:, None])
        main = jnp.concatenate(cols, axis=1)
        counts = jnp.stack([jnp.asarray(accept.shape[0], jnp.int32),
                            jnp.sum(accept, dtype=jnp.int32)])
        return ("packed", main, counts, keys)

    def _finish_round(self, pending):
        """Materialize a dispatched round: block on the device outputs,
        read them back, dedup/detokenize/physchem on host; returns row
        dicts. The dispatch+device stage timer starts at launch time, so
        under the overlapped worker loop it includes time the worker
        spent post-processing the PREVIOUS round — that is the overlap
        working as intended, not double-counted device time."""
        n, t0, out = pending
        if isinstance(out, tuple) and out and out[0] == "packed":
            _, main, counts, keys = out
            jax.block_until_ready(main)
            t_dev = time.perf_counter()
            main_np = np.asarray(main)
            n_candidates, n_accepted = (int(x) for x in
                                        np.asarray(counts))
            t_d2h = time.perf_counter()
            T = main_np.shape[1] - 1 - len(keys)
            keep_flag = main_np[:, T].astype(bool)
            tokens_np = main_np[:, :T][keep_flag]
            scores_np = {
                k: np.ascontiguousarray(
                    main_np[:, T + 1 + i]).view(np.float32)[keep_flag]
                for i, k in enumerate(keys)}
        else:  # raw 6-tuple (tests inject these)
            z, scores, accept, tokens, _idx, valid = out
            jax.block_until_ready(tokens)
            t_dev = time.perf_counter()
            tokens_np = np.asarray(tokens)
            accept_np = np.asarray(accept)
            scores_np = {k: np.asarray(v) for k, v in scores.items()}
            n_candidates = accept_np.shape[0]
            t_d2h = time.perf_counter()
            if valid is not None:
                v = np.asarray(valid)
                tokens_np = tokens_np[v]
                scores_np = {k: s[v] for k, s in scores_np.items()}
                n_accepted = int(accept_np.sum())
            else:
                n_accepted = int(accept_np.sum())
                tokens_np = tokens_np[accept_np]
                scores_np = {k: s[accept_np] for k, s in scores_np.items()}
        # runtime miscompile canary (pipeline.beam_canary_check): a
        # within-round uniqueness collapse on the Pallas beam route flips
        # the process to the XLA arm; this round's rows are suspect, so
        # drop them (the worker also drops its pre-dispatched round)
        keys = list(pipeline.canonical_keys(tokens_np))
        if pipeline.beam_canary_check(
                self.cfg, self.model, len(keys), len(set(keys)),
                context=f"serve round {self._round_ix}"):
            self._canary_tripped = True
            return []
        # global dedup on canonicalized token rows (pipeline contract)
        keep = np.empty(tokens_np.shape[0], bool)
        for i, rb in enumerate(keys):
            if rb in self._seen:
                keep[i] = False
            else:
                keep[i] = True
                self._seen.add(rb)
        dup = int(keep.size - keep.sum())
        kept_tokens = tokens_np[keep].astype(np.int32)
        peptides = self.dataset.idx2sentences(kept_tokens,
                                              print_special_tokens=False)
        H, uH, charge = modlamp_from_tokens(kept_tokens,
                                            self.dataset.vocab.itos)
        t1 = time.perf_counter()
        dt = t1 - t0
        # stage split, logged so the load test shows WHERE a round's wall
        # goes on a tunneled device: dispatch+device (launch -> outputs
        # ready), d2h (device->host readback of tokens/scores), host
        # (dedup + physchem + detokenize)
        s_dev, s_d2h, s_host = t_dev - t0, t_d2h - t_dev, t1 - t_d2h
        with self._lock:
            self.stats["rounds"] += 1
            self.stats["candidates"] += n_candidates
            self.stats["accepted"] += n_accepted
            self.stats["duplicates"] += dup
            self.stats["device_s"] += dt
            st = self.stats.setdefault(
                "stage_s", {"dispatch_device": 0.0, "d2h": 0.0,
                            "host_postproc": 0.0})
            st["dispatch_device"] += s_dev
            st["d2h"] += s_d2h
            st["host_postproc"] += s_host
        LOG.info("round %d: %d candidates -> %d accepted, %d unique "
                 "(%.2fs = %.2f dev + %.2f d2h + %.2f host)",
                 self._round_ix, n_candidates, n_accepted,
                 len(peptides), dt, s_dev, s_d2h, s_host)
        rows = []
        score_cols = {k: s[keep] for k, s in scores_np.items()}
        for i, pep in enumerate(peptides):
            row = {"peptide": pep, "H": float(H[i]), "uH": float(uH[i]),
                   "charge": float(charge[i])}
            for k, s in score_cols.items():
                row[k] = float(s[i])
            rows.append(row)
        return rows

    # -- introspection -------------------------------------------------------

    def stats_snapshot(self):
        with self._lock:
            out = dict(self.stats)
            out["outstanding"] = self._outstanding()
            out["unique_seen"] = len(self._seen)
        up = time.time() - out["started_at"] if out["started_at"] else 0.0
        out["uptime_s"] = up
        out["accepted_per_s"] = out["accepted"] / max(up, 1e-9)
        return out


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib only)
# ---------------------------------------------------------------------------

def make_http_server(server, host="127.0.0.1", port=8800,
                     max_n=100_000, request_timeout=600.0):
    """Wrap a started GenerationServer in a ThreadingHTTPServer.

    POST /generate {"n": 10}  -> {"samples": [...], "n": 10}
    GET  /healthz             -> {"ok": true}
    GET  /stats               -> throughput counters
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _Server(ThreadingHTTPServer):
        # socketserver's default listen backlog is 5: a burst of
        # concurrent clients (the 16x3 load test opens 48 connections
        # at once) overflows the accept queue — measured as multi-second
        # p99 waits before the request even reaches the handler, and
        # occasional [Errno 104] connection resets. The serving layer
        # coalesces demand precisely so bursts are cheap; let them in.
        request_queue_size = 128

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True,
                                 "backend": jax.default_backend(),
                                 "n_devices": len(jax.devices())})
            elif self.path == "/stats":
                self._json(200, server.stats_snapshot())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": f"no route {self.path}"})
                return
            # client errors (malformed JSON, non-numeric/absurd n, null
            # timeout) are 400s; only server-side failures return 500
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                if not isinstance(payload, dict):
                    raise ValueError("body must be a JSON object")
                n = int(payload.get("n", 1))
                timeout = float(payload.get("timeout", request_timeout))
            except (json.JSONDecodeError, ValueError, TypeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return
            if not (0 < n <= max_n):
                self._json(400, {"error": f"n must be in [1, {max_n}]"})
                return
            try:
                rows = server.generate(n, timeout=timeout)
                self._json(200, {"n": len(rows), "samples": rows})
            except TimeoutError as e:
                self._json(504, {"error": str(e)})
            except RuntimeError as e:  # server stopped mid-request
                self._json(503, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                LOG.exception("generate failed")
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *a):
            LOG.debug("%s " + fmt, self.address_string(), *a)

    return _Server((host, port), Handler)


def build_server(cfg, args):
    """Load a trained run and fit Q + latent classifiers exactly as the
    batch pipeline does (pipeline.run), then return an un-started
    GenerationServer."""
    from . import config as C
    from .api import (load_trained_model, get_model_and_vocab_path,
                      load_vocab)
    from .data import AttributeDataLoader

    model_path, vocab_path, _ = get_model_and_vocab_path(cfg)
    vocab = load_vocab(vocab_path)
    model, params = load_trained_model(model_path, vocab.size(), cfg)
    spec = C.dataset_spec(cfg)
    spec.pop("synthetic", None)
    dataset = AttributeDataLoader(mbsize=cfg.vae.batch_size,
                                  max_seq_len=cfg.max_seq_len, **spec)
    qkwargs = dict(pipeline.Q_KWARGS)
    for k in qkwargs:
        if hasattr(args, "Q_" + k):
            qkwargs[k] = getattr(args, "Q_" + k)
    QClass = pipeline.resolve_QClass(getattr(args, "QClass", "mogQ"))
    q_select = {"amp": 1} if args.Q_select_amppos else {}
    key = jax.random.PRNGKey(cfg.seed)
    Q, _ = pipeline.fitQ_and_test(cfg, QClass, qkwargs, q_select,
                                  {}, key=key)
    z_clfs = {attr: pipeline.build_clfZ(cfg, attr, spec["attributes"])
              for attr in ["amp", "tox"]}
    Q.init_attr_classifiers(z_clfs, clf_targets={"amp": 1, "tox": 0})

    n_dp = int(cfg.hw.get("dp", 1))
    if n_dp == 0:
        n_dp = len(jax.devices())
    mesh = None
    if n_dp > 1:
        from . import parallel
        mesh = parallel.get_mesh(n_dp, cfg.hw.get("mesh_axis", "data"))
    return GenerationServer(cfg, model, params, dataset, Q,
                            round_size=args.n_samples_per_round, mesh=mesh)
