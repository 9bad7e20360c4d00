"""CLaSS sampling pipeline (reference: sample_pipeline.py).

Fit the attribute-conditioned marginal posterior Q_xi^a(z) (GMM by on-device
EM), fit latent logistic-regression attribute classifiers, then loop:
rejection-sample latents (one fused device program per round), beam-decode
them in fixed-size chunks (batched on-device beam), score physicochemistry,
dedup on host, until enough accepted samples exist.

Differences from the reference are TPU-structural, not semantic: the Q fit,
classifier fits, rejection scoring and beam decode all run on device; pandas
bookkeeping, dedup and artifact IO stay host-side.
"""

import datetime
import json
import logging
import os
import time
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from . import config as C
from .api import (load_trained_model, get_model_and_vocab_path,
                  get_result_for_model, load_vocab)
from .data import AttributeDataLoader
from .evals.peptide_evals import compute_modlamp, modlamp_from_tokens
from .generation import generate_sentences
from .latent import density, logreg
from .vis import build_index

LOG = logging.getLogger("GenerationAPI")


def is_device_oom(e):
    """True only for an XLA runtime/compile RESOURCE_EXHAUSTED.

    The self-correcting HBM clamps (here and in serve.GenerationServer)
    permanently shrink the dispatch when this returns True, so it must
    not trigger on arbitrary exceptions whose message merely mentions
    memory — only jax's own runtime error type qualifies."""
    return (isinstance(e, jax.errors.JaxRuntimeError)
            and ("RESOURCE_EXHAUSTED" in str(e)
                 or "Out of memory" in str(e)))

Q_CLASS = density.mogQ
Q_KWARGS = {"n_components": None, "z_num_samples": 10,
            "covariance_type": None}

# --QClass resolution. The reference parses the flag but never reads it
# (sample_pipeline.py:333 vs its module-level Q_CLASS at :36 — a dead
# flag); here all three density families are fused-round compatible
# (density.py exposes _sampler() on each), so the flag is live.
Q_CLASSES = {"mogQ": density.mogQ, "fullQ": density.fullQ,
             "gaussianQ": density.gaussianQ}


def resolve_QClass(name):
    try:
        return Q_CLASSES[name]
    except KeyError:
        raise ValueError(
            f"unknown QClass {name!r}; one of {sorted(Q_CLASSES)}")


# ---------------------------------------------------------------------------
# encodings
# ---------------------------------------------------------------------------

def get_encodings_from_states(cfg, query, split, attributes=None):
    """Read dumped latent states and filter rows matching
    {attr_name: label} (reference sample_pipeline.py:73-92)."""
    attributes = attributes or C.dataset_spec(cfg)["attributes"]
    attr_to_colix = {k: i for i, (k, _) in enumerate(attributes)}
    fname = build_index.states_path(cfg.savepath, split, cfg.vae.n_iter)
    assert os.path.exists(fname), (
        f"need dumped states at {fname}, run static_eval --long first")
    states = build_index.read_states(fname)
    mu = states["mu"].astype(np.float64)
    logvar = states["logvar"].astype(np.float64)
    lab = states["label"]
    sel = np.ones(lab.shape[0], bool)
    for attr_name, val in query.items():
        sel &= lab[:, attr_to_colix[attr_name]] == val
    return mu[sel], logvar[sel]


def get_encodings_from_dataloader(cfg, query, split, model, params,
                                  dataloader):
    """Encode amp-positive rows straight from the dataloader
    (reference sample_pipeline.py:47-71)."""
    assert query == {"amp": 1}, "only amp=1 supported, as in the reference"
    spec = {"get_encoding": {
        "subset": [f"split={split}", "amp=amp_posc,amp_posnc"],
        "repeat": False}}
    iterators, _ = dataloader.get_subset_iterators(spec, cfg.vae.batch_size)

    @jax.jit
    def encode(text):
        (mu, logvar), _, _ = model.forward(
            params, jax.random.PRNGKey(0), text, q_c="classifier",
            sample_z="max", train=False)
        return mu, logvar

    mus, logvars = [], []
    for rows in iterators["get_encoding"]:
        batch = dataloader._make_batch(rows)
        mu, logvar = encode(jnp.asarray(batch.text))
        mus.append(np.asarray(mu))
        logvars.append(np.asarray(logvar))
    return np.concatenate(mus), np.concatenate(logvars)


# ---------------------------------------------------------------------------
# Q fit + latent classifiers
# ---------------------------------------------------------------------------

def fitQ_and_test(cfg, QClass, QKwargs, Q_select=None, negative_select=None,
                  model=None, params=None, dataloader=None, key=None):
    Q_select = Q_select or {}
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    if model is not None and dataloader is not None:
        mu, logvar = get_encodings_from_dataloader(
            cfg, Q_select, "train,val", model, params, dataloader)
    else:
        mu, logvar = get_encodings_from_states(cfg, Q_select, "train")

    # keep only the kwargs this Q family's __init__ accepts (mogQ takes
    # n_components/covariance_type/..., fullQ and gaussianQ do not)
    import inspect
    accepts = set(inspect.signature(QClass.__init__).parameters)
    qkw = {k: v for k, v in QKwargs.items()
           if v is not None and k in accepts}
    if "key" in accepts:
        qkw["key"] = key
    Q = QClass(np.asarray(mu, np.float32), np.asarray(logvar, np.float32),
               **qkw)
    if hasattr(Q, "info"):
        LOG.info("mog-%s. Converged: %s in %s iters, "
                 "log likelihood lower bound: %.4f",
                 qkw.get("n_components"), bool(Q.info.converged),
                 int(Q.info.n_iter), float(Q.info.lower_bound))
    LOG.info("Fitted %s %s on selection %s", QClass.__name__, str(qkw),
             str(Q_select))

    eval_points = [
        ("a,tr", get_encodings_from_states(cfg, Q_select, "train")),
        ("a,hld", get_encodings_from_states(cfg, Q_select, "test")),
    ]
    metrics = OrderedDict()
    for i, (name, points) in enumerate(eval_points):
        metrics[name] = density.evaluate_nll(
            Q, points, jax.random.fold_in(key, 100 + i))
    return Q, metrics


def build_clfZ(cfg, attr, attributes=None):
    """Latent logistic-regression classifier attr=1 vs attr=0 on encoder
    means (reference sample_pipeline.py:169-192), fit on device."""
    zpos_mu, _ = get_encodings_from_states(cfg, {attr: 1}, "train",
                                           attributes)
    zneg_mu, _ = get_encodings_from_states(cfg, {attr: 0}, "train",
                                           attributes)
    X = jnp.asarray(np.concatenate([zpos_mu, zneg_mu]), jnp.float32)
    y = jnp.concatenate([jnp.ones(len(zpos_mu)), jnp.zeros(len(zneg_mu))])
    clf, n_iter = logreg.fit(X, y)
    acc = float(logreg.accuracy(clf, X, y))
    LOG.info("Fitted LogReg classifier in z-space, on attr=%s.", attr)
    LOG.info("num samples: %d pos, %d neg. train accuracy=%.5f",
             len(zpos_mu), len(zneg_mu), acc)
    return clf


# ---------------------------------------------------------------------------
# decode + sampling rounds
# ---------------------------------------------------------------------------

# beam width of every pipeline decode stage (the reference's K,
# sample_pipeline.py:132-137); the fused rounds and the HBM clamp below
# must agree on it
DECODE_BEAM_SIZE = 5


def decode_from_z(z, model, params, dataset, key=None, chunk=1024,
                  beam_size=DECODE_BEAM_SIZE):
    """Beam-decode latents in fixed-size chunks (top-1 hypothesis kept).
    The final partial chunk is zero-padded so every launch reuses one
    compiled program (reference decodes variable chunks:
    sample_pipeline.py:129-139)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    z = np.asarray(z, np.float32)
    if (model.flow > 0
            and getattr(model, "flow_mode", "gen_prior") == "posterior"):
        # Q latents live in encoder-mean (z0) space; posterior-flow models
        # decode z_K = flow(z0). (gen_prior flow application happens inside
        # generate_sentences, matching the reference.)
        z = np.asarray(model.apply_flow(params, jnp.asarray(z))[0])
    n = z.shape[0]
    outs = []
    LOG.info("Decoder decoding: beam search")
    for s in range(0, n, chunk):
        zc = z[s:s + chunk]
        pad = chunk - zc.shape[0]
        # always pad partial chunks to the full width so every launch —
        # including n < chunk — reuses the one compiled program
        if pad:
            zc = np.concatenate([zc, np.zeros((pad, z.shape[1]), z.dtype)])
        sents, _, _ = generate_sentences(
            model, params, jax.random.fold_in(key, s), zc.shape[0],
            z=jnp.asarray(zc), sample_mode="beam", beam_size=beam_size,
            n_best=1)
        top1 = np.asarray(sents)[:, 0, :]
        outs.append(top1[:chunk - pad] if pad else top1)
    tokens = np.concatenate(outs, axis=0)
    return dataset.idx2sentences(tokens, print_special_tokens=False)


def transformer_dispatch_budget(cfg, model, n_dp=1):
    """Max candidates per fused dispatch for the transformer decoder
    family, or None when no clamp applies (GRU/deconv families).

    Each beam lane of the transformer decoder carries a KV cache of
    L*(T+1)*d_model values in the decode dtype (~70x the GRU hidden
    state); a 50k-candidate fused dispatch at beam 5 wants ~20 GB of HBM
    and dies at compile time. The budget (hw.tfm_lane_budget_gb, per
    device) divides out a measured ~6x total-HBM-to-raw-cache program
    overhead (attention temps, scan emissions, double buffering — a
    25k-slot dispatch used 20 GB against 3.3 GB of raw cache; pass
    hw.log_hbm_analysis=1 to re-measure the factor for a new shape).
    Used by pipeline.run to clamp rounds_per_dispatch and by
    serve.GenerationServer to cap burst round sizes — the two surfaces
    must agree or a burst can compile-OOM the server."""
    per_cand = transformer_cache_bytes_per_candidate(cfg, model)
    if per_cand is None:
        return None
    lane_budget = int(cfg.hw.get("tfm_lane_budget_gb", 4.0)
                      * 2**30) * max(int(n_dp), 1)
    return max(int(lane_budget / max(6 * per_cand, 1)), 1)


def transformer_cache_bytes_per_candidate(cfg, model):
    """Raw KV-cache bytes one candidate's beam lanes carry through a fused
    round, or None for non-transformer families. The 6x program-overhead
    factor is applied by transformer_dispatch_budget, not here."""
    if getattr(model, "G_class", "gru") != "transformer":
        return None
    t_args = model.dec_tfm_args
    dt_bytes = jnp.dtype(cfg.hw.get("gen_dtype", "bfloat16")).itemsize
    cache_bytes = (t_args.get("n_layers", 2)
                   * (model.max_seq_len + 1)
                   * t_args.get("d_model", 128) * 2 * dt_bytes)
    cap = float(cfg.hw.get("accept_cap_frac", 0.5))
    return cache_bytes * DECODE_BEAM_SIZE * (
        cap if cfg.hw.get("decode_mode", "all") == "accepted" else 1.0)


def round_capacity(cfg, n_samples, mesh=None):
    """Decode-slot capacity for hw.decode_mode="accepted", or None for the
    decode-all reference contract."""
    if cfg.hw.get("decode_mode", "all") != "accepted":
        return None
    frac = float(cfg.hw.get("accept_cap_frac", 0.5))
    capacity = max(int(round(n_samples * frac)), 1)
    if mesh is not None:
        capacity += (-capacity) % mesh.devices.size
    # more slots than candidates would misalign the compacted outputs
    # (argsort(...)[:capacity] can't exceed n rows); n is always
    # mesh-divisible so the clamp preserves that too
    return min(capacity, n_samples)


def launch_round(cfg, model, params, Q, n_samples, key, fused=True,
                 mesh=None):
    """Dispatch one round's device work WITHOUT materializing results.

    fused=True runs rejection + c-prior + full-batch beam decode as ONE
    device dispatch (latent/fused.py) — semantically identical to the
    chunked path, an order of magnitude faster on remote TPUs. With a
    mesh, the same program runs sharded over the batch axis
    (parallel.dp_fused_round): each device owns n/D candidates.

    Returns (z, scores dict, accept, tokens, idx, valid) as device arrays:
    jax dispatch is asynchronous, so the caller can overlap this round's
    compute with the previous round's host-side bookkeeping (the
    reference's loop is strictly serial, sample_pipeline.py:303-323).
    Under hw.decode_mode="all" every candidate is decoded and idx/valid
    are None; under "accepted" only accepted candidates occupy the
    fixed-capacity decode slots (latent/fused.py module docstring) and
    z/scores/tokens carry the compacted rows, valid marking real ones."""
    capacity = round_capacity(cfg, n_samples, mesh)
    idx = valid = None
    if fused and mesh is not None:
        from . import parallel
        out = parallel.dp_fused_round(
            mesh, model, params, key, Q, n_samples,
            beam_size=DECODE_BEAM_SIZE,
            axis=cfg.hw.get("mesh_axis", "data"),
            decode_dtype=cfg.hw.get("gen_dtype", "bfloat16"),
            capacity=capacity)
    else:
        from .latent.fused import fused_round
        out = fused_round(
            model, params, key, Q, n_samples,
            beam_size=DECODE_BEAM_SIZE,
            decode_dtype=cfg.hw.get("gen_dtype", "bfloat16"),
            capacity=capacity)
    if capacity is None:
        z, scores, accept, tokens = out
    else:
        z, scores, accept, tokens, idx, valid = out
    # downcast on device before the host fetch: z rows are only kept as a
    # float16 artifact column, and token ids fit a byte — over a tunneled
    # TPU the D2H transfer is a visible slice of the round. Score columns
    # stay fp32: prob_accum of rejected candidates is routinely below
    # float16's minimum normal (that's WHY they were rejected), and the
    # saved artifact must support log(prob_accum) downstream.
    z = z.astype(jnp.float16)
    if model.n_vocab < 256:
        tokens = tokens.astype(jnp.uint8)
    return z, scores, accept, tokens, idx, valid


def get_new_samples(cfg, model, params, dataset, Q, n_samples, key,
                    fused=True, mesh=None):
    """One round: rejection-sample z's, decode all of them, assemble the
    per-sample dataframe (reference sample_pipeline.py:196-208)."""
    if fused:
        samples_z, scores_z, accept_z, tokens, idx, valid = launch_round(
            cfg, model, params, Q, n_samples, key, fused=True, mesh=mesh)
        if valid is not None:
            # accepted-only decode: only the valid compacted slots are
            # real samples; every stored row is accepted by construction
            v = np.asarray(valid)
            samples_z = np.asarray(samples_z)[v]
            scores_z = {k: np.asarray(s)[v] for k, s in scores_z.items()}
            tokens = np.asarray(tokens)[v]
            accept_z = np.ones(tokens.shape[0], bool)
        samples = dataset.idx2sentences(np.asarray(tokens),
                                        print_special_tokens=False)
    else:
        k_rej, k_dec = jax.random.split(key)
        samples_z, scores_z, accept_z = Q.rejection_sample(k_rej, n_samples)
        samples = decode_from_z(samples_z, model, params, dataset,
                                key=k_dec)
    scores_np = {k: (np.asarray(v) if hasattr(v, "shape") else v)
                 for k, v in scores_z.items()}
    return pd.DataFrame({
        "peptide": samples,
        # z rows stay float16 ndarrays: building 50k python tuples per
        # round dominated the host side of the loop
        "z": list(np.asarray(samples_z, np.float16)),
        "accept_z": np.asarray(accept_z),
        **scores_np,
    })


def one_sampling_round(cfg, model, params, dataset, Q, n_samples_per_round,
                       key, fused=True, mesh=None):
    df = get_new_samples(cfg, model, params, dataset, Q,
                         n_samples_per_round, key, fused=fused, mesh=mesh)
    df = compute_modlamp(df)
    df["accept"] = df["accept_z"]
    return df


def save_csv_pkl(samples, fn):
    samples.drop(columns="z").to_csv(fn + ".csv", index_label="idx")
    samples.to_pickle(fn + ".pkl")


def save_samples(samples, basedir, fn_prefix):
    outfn = os.path.join(basedir, fn_prefix)
    outfn += "_{}".format(datetime.datetime.now().isoformat().split("T")[0])
    with open(outfn + ".plain.txt", "w") as fh:
        fh.write(samples["peptide"].to_string(index=False))
    save_csv_pkl(samples, outfn)
    LOG.info("Full sample list written to %s.pkl/csv", outfn)
    accepted = samples[samples.accept]
    accepted_fn = f"{outfn}.accepted.{len(accepted)}"
    save_csv_pkl(accepted, accepted_fn)
    LOG.info("Accepted sample list written to %s.pkl/csv", accepted_fn)
    return outfn


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def run(cfg, args):
    """Full pipeline main (reference sample_pipeline.py:236-326)."""
    model_path, vocab_path, _ = get_model_and_vocab_path(cfg)
    LOG.info("Load model, vocab, dataloader.")
    vocab = load_vocab(vocab_path)
    model, params = load_trained_model(model_path, vocab.size(), cfg)
    LOG.info("Loaded model succesfully.")

    spec = C.dataset_spec(cfg)
    spec.pop("synthetic", None)
    dataset = AttributeDataLoader(mbsize=cfg.vae.batch_size,
                                  max_seq_len=cfg.max_seq_len, **spec)

    try:
        metrics = get_result_for_model(model_path, print_results=False)
        LOG.info("Model metrics: %s", json.dumps(metrics)[:500])
    except FileNotFoundError:
        LOG.info("No result.json next to model; continuing.")

    LOG.info("Fit attribute-conditioned marginal posterior Q_xi^a(z)")
    qkwargs = dict(Q_KWARGS)
    for k in qkwargs:
        if hasattr(args, "Q_" + k):
            qkwargs[k] = getattr(args, "Q_" + k)

    QClass = resolve_QClass(getattr(args, "QClass", "mogQ"))
    q_select = {"amp": 1} if args.Q_select_amppos else {}
    key = jax.random.PRNGKey(cfg.seed)
    Q, q_metrics = fitQ_and_test(
        cfg, QClass, qkwargs, q_select, {},
        model if args.Q_from_full_dataloader else None,
        params if args.Q_from_full_dataloader else None,
        dataset if args.Q_from_full_dataloader else None,
        key=key)
    LOG.info("Q Fit metrics: %s", json.dumps(q_metrics, indent=4))

    z_clfs = {attr: build_clfZ(cfg, attr, spec["attributes"])
              for attr in ["amp", "tox"]}
    Q.init_attr_classifiers(z_clfs, clf_targets={"amp": 1, "tox": 0})

    t_sampling = time.perf_counter()

    # multi-chip: shard each round over a device mesh (hw.dp; 0 = all)
    n_dp = int(cfg.hw.get("dp", 1))
    if n_dp == 0:
        n_dp = len(jax.devices())
    # rounds per device dispatch: the tunnel serializes dispatches
    # (~150 ms RTT each), so drawing R rounds' worth of candidates in one
    # program amortizes it (distribution-identical; host dedup unchanged)
    rpd = max(int(cfg.hw.get("rounds_per_dispatch", 1)), 1)
    budget = transformer_dispatch_budget(cfg, model, n_dp)
    if budget is not None:
        # clamp the dispatch to the per-device lane budget and let the
        # loop issue more (async) dispatches instead
        max_rpd = max(budget // args.n_samples_per_round, 1)
        if rpd > max_rpd:
            LOG.info("transformer decoder: clamping rounds_per_dispatch "
                     "%d -> %d (KV-cache lane budget %.1f GB x %d devices)",
                     rpd, max_rpd,
                     float(cfg.hw.get("tfm_lane_budget_gb", 4.0)), n_dp)
            rpd = max_rpd
    mesh = None
    if n_dp > 1:
        from . import parallel
        mesh = parallel.get_mesh(n_dp, cfg.hw.get("mesh_axis", "data"))
        LOG.info("CLaSS rounds sharded over %d devices", n_dp)

    fused = cfg.hw.get("fused_rounds", True)
    round_size = args.n_samples_per_round * rpd
    if (budget is not None and mesh is None and fused
            and cfg.hw.get("log_hbm_analysis", False)):
        # measure the lane-budget heuristic's "~6x program overhead"
        # factor for this exact shape (fused.round_memory_analysis); with
        # the persistent compile cache on, the loop below reuses the
        # compiled executable
        try:
            from .latent import fused as fused_mod
            mem = fused_mod.round_memory_analysis(
                model, params, jax.random.fold_in(key, 1), Q, round_size,
                beam_size=DECODE_BEAM_SIZE,
                decode_dtype=cfg.hw.get("gen_dtype", "bfloat16"),
                capacity=round_capacity(cfg, round_size, mesh))
            total = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                     + mem.output_size_in_bytes)
            raw = (transformer_cache_bytes_per_candidate(cfg, model)
                   * round_size)
            LOG.info("fused-round HBM analysis @ %d candidates: "
                     "temp %.2f GB, args %.2f GB, out %.2f GB; "
                     "total/raw-KV-cache factor %.1fx (heuristic uses 6x)",
                     round_size, mem.temp_size_in_bytes / 2**30,
                     mem.argument_size_in_bytes / 2**30,
                     mem.output_size_in_bytes / 2**30, total / max(raw, 1))
        except Exception as e:  # probe is advisory, never fatal
            LOG.info("HBM analysis unavailable: %s", e)
    if fused:
        samples = _fused_sampling_loop(cfg, args, model, params, dataset,
                                       Q, key, round_size, mesh)
    else:
        samples = _serial_sampling_loop(cfg, args, model, params, dataset,
                                        Q, key, round_size)

    dt = time.perf_counter() - t_sampling
    LOG.info("CLaSS throughput: %.1f accepted samples/sec "
             "(%d accepted, %d candidates, %.2fs)",
             samples["accept"].sum() / max(dt, 1e-9),
             int(samples["accept"].sum()), len(samples), dt)
    return save_samples(samples, cfg.savepath, args.samples_outfn_prefix)


@jax.jit
def _gather_rows(a, idx):
    return a[idx]


def _gather_z_rows_async(z_dev, slot_idx):
    """Dispatch a device gather of the kept z rows; do NOT materialize.

    Returns (device_array, k): the caller keeps the handle and fetches at
    DataFrame-assembly time, so the gather rides the device queue behind
    the in-flight rounds without ever blocking the host loop. slot_idx is
    padded to the next power of two so the tiny gather program compiles
    O(log n) times per process instead of once per distinct kept count;
    the padded tail is sliced off at materialization."""
    k = len(slot_idx)
    if k == 0:
        return None, 0
    pad = 1 << (k - 1).bit_length()
    idx = np.zeros(pad, np.int32)
    idx[:k] = slot_idx
    g = _gather_rows(z_dev, jnp.asarray(idx))
    if hasattr(g, "copy_to_host_async"):
        g.copy_to_host_async()
    return g, k


def _materialize_z(parts):
    """[(device_array|None, k)] -> one [N, D] host array of kept z rows."""
    rows = [np.asarray(g)[:k] for g, k in parts if k]
    if not rows:
        return np.zeros((0, 0), np.float16)
    return np.concatenate(rows)


def _log_round_rates(n_accept_z, n_accept, n_total, dropped):
    if dropped > 0:
        LOG.info("Dropped %d duplicate samples", dropped)
    LOG.info("Q_xi(z|a) rejection sampling acceptance rate: "
             "%d/%d = %.4f", n_accept_z, n_total,
             100.0 * n_accept_z / max(n_total, 1))
    LOG.info("     - full filter pipeline accepted: %d/%d = %.4f",
             n_accept, n_total, 100.0 * n_accept / max(n_total, 1))


def canonical_keys(tokens):
    """Dedup keys for decoded token rows: each row projected to its residue
    tokens (> EOS_IDX) left-packed over a zero tail — exactly the content
    idx2sentences renders, so key equality IS stripped-string equality even
    when beam emits UNK/PAD mid-sequence. Returns an iterator of bytes."""
    residue = tokens > 3  # specials pinned at 0..3 (vocab contract)
    order = np.argsort(~residue, axis=1, kind="stable")
    keys = np.take_along_axis(
        np.where(residue, tokens, 0), order, axis=1)
    return map(bytes, keys)


def beam_canary_check(cfg, model, n_rows, n_unique, context=""):
    """Runtime Pallas-beam miscompile canary (VERDICT r4 item 6).

    The round-4 tape scramble was a shape-dependent Mosaic miscompile
    that survived the offline divergence protocol (its probe shape
    happened to compile correctly) and silently scrambled production
    campaign output. Its signature — and that of any tape-corruption
    class — is a collapse of WITHIN-ROUND unique decoded sequences.
    This check runs on every production round's already-materialized
    host tokens (the dedup pass computes the unique count anyway, so
    overhead is ~0): when the unique ratio drops below
    hw.beam_canary_floor while the fused Pallas beam route is active,
    it logs one WARNING and flips the process to the oracle-exact XLA
    arm (set_pallas_beam(False) + cache clear so in-flight compiled
    programs are retraced). Returns True when it tripped — callers
    should DISCARD the tripping round's rows (they may be scrambled)
    and drop any rounds pre-dispatched on the old route.

    A genuinely collapsed model also yields low uniqueness — but then
    the XLA arm reproduces it and the check never re-trips (the route
    predicate below is False once flipped), so the cost of a false
    positive is one recompile, never a loop."""
    floor = float(cfg.hw.get("beam_canary_floor", 0.02))
    min_rows = int(cfg.hw.get("beam_canary_min_rows", 256))
    if floor <= 0 or n_rows < min_rows:
        return False
    if n_unique / max(n_rows, 1) >= floor:
        return False
    from .ops import beam as beam_mod
    from .ops import pallas_beam, pallas_tfm_beam
    gen_dtype = jnp.dtype(cfg.hw.get("gen_dtype", "float32"))
    # Mirror ops/beam.py's routing: the GRU kernel routes on auto, the
    # transformer kernel only when forced (--hw.pallas_beam on). The
    # canary must cover whichever kernel route is actually live.
    on_gru_kernel = (beam_mod.pallas_beam_enabled()
                     and pallas_beam.applicable(model, DECODE_BEAM_SIZE,
                                                gen_dtype))
    on_tfm_kernel = (beam_mod._PALLAS_BEAM is True
                     and pallas_tfm_beam.applicable(
                         model, DECODE_BEAM_SIZE, gen_dtype))
    if not (on_gru_kernel or on_tfm_kernel):
        return False  # already on the XLA arm: low uniqueness is real
    LOG.warning(
        "BEAM CANARY tripped%s: %d/%d unique decoded sequences "
        "(< hw.beam_canary_floor=%.3f) on the Pallas beam route — "
        "possible shape-dependent miscompile (see BENCH.md 'tape "
        "scramble'); falling back to the XLA beam arm and discarding "
        "this round", f" ({context})" if context else "", n_unique,
        n_rows, floor)
    beam_mod.set_pallas_beam(False)
    jax.clear_caches()
    return True


def _fused_sampling_loop(cfg, args, model, params, dataset, Q, key,
                         round_size, mesh):
    """Overlapped sampling loop: up to hw.rounds_in_flight rounds are
    dispatched ahead of the one being consumed, so the device computes
    round R+1 (and streams R+2's transfers) while the host runs round R's
    dedup/physchem/accounting. All per-round host work is vectorized over
    the round's token matrix; the DataFrame is assembled once at the end.

    Rounds are keyed by fold_in(key, round_ix), so the candidate stream is
    identical to the strictly serial reference loop
    (sample_pipeline.py:303-323) — only the schedule overlaps."""
    from collections import deque

    depth = max(int(cfg.hw.get("rounds_in_flight", 2)), 1)
    seen = set()
    store = {"peptide": [], "z": [], "accept_z": [], "H": [], "uH": [],
             "charge": []}
    score_store = {}
    n_total = n_accept = 0
    n_cand_seen = n_accept_z_seen = 0
    round_ix = 0
    inflight = deque()

    def launch_one():
        nonlocal round_ix, round_size
        round_ix += 1
        LOG.info("Round #%d (x%d candidates per dispatch)", round_ix,
                 round_size)
        # Self-correcting HBM clamp: the transformer lane-budget estimate
        # (transformer_dispatch_budget) is a measured heuristic — if a
        # shape's true program-overhead factor exceeds it, the compile
        # OOMs here (jit compiles synchronously on first call). Halve the
        # dispatch and retry instead of dying; subsequent rounds reuse the
        # smaller shape. Bounded: gives up once a dispatch can't shrink.
        while True:
            try:
                out = launch_round(
                    cfg, model, params, Q, round_size,
                    jax.random.fold_in(key, round_ix), fused=True,
                    mesh=mesh)
                break
            except Exception as e:
                oom = is_device_oom(e)
                shrink = round_size // 2
                if mesh is not None:
                    shrink -= shrink % mesh.devices.size
                if not oom or shrink < 1:
                    raise
                LOG.warning(
                    "fused round OOM at %d candidates/dispatch; "
                    "retrying at %d (tune hw.tfm_lane_budget_gb)",
                    round_size, shrink)
                round_size = shrink
        # start the D2H copies NOW for everything except z: over a
        # tunneled TPU the transfers are a large slice of the round
        # (~15-25 MB/s measured), so (a) async copies run behind the
        # previous rounds' host work instead of blocking at consume time,
        # and (b) z — 10 of the ~12 MB a 50k round would move — stays on
        # device until dedup decides which rows are kept, then only those
        # are gathered and fetched (_gather_z_rows_async). idx (out[4])
        # is skipped too: no host-side consumer reads it.
        z_dev, scores_d, accept_d, tokens_d, _idx, valid_d = out
        for leaf in jax.tree.leaves(
                (scores_d, accept_d, tokens_d, valid_d)):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()
        inflight.append(out)

    launch_one()
    while True:
        # keep the launch-ahead queue full while the job plausibly needs
        # more rounds: rejection sampling rarely finishes in one round,
        # and an unused in-flight round costs the host nothing
        while len(inflight) < depth:
            launch_one()
        z_d, scores_d, accept_d, tokens_d, idx_d, valid_d = \
            inflight.popleft()
        # materialize round R (blocks until its device program finishes);
        # z stays device-resident — only kept rows are fetched below
        tokens = np.asarray(tokens_d)
        accept_full = np.asarray(accept_d)
        n_candidates = accept_full.shape[0]
        scores = {k: np.asarray(v) for k, v in scores_d.items()}
        slots = None
        if valid_d is not None:
            # accepted-only decode: keep the valid compacted slots; every
            # surviving row is accepted by construction. Accepted
            # candidates beyond the decode capacity are dropped on device
            # (unbiased — i.i.d. draws): they still count toward the
            # rejection-test acceptance rate (n_accept_z_seen — they WERE
            # accepted by the test) but are never decoded, stored or
            # counted as delivered samples.
            v = np.asarray(valid_d)
            over_cap = int(accept_full.sum()) - int(v.sum())
            if over_cap > 0:
                LOG.info("Accepted candidates beyond decode capacity "
                         "dropped: %d", over_cap)
            slots = np.nonzero(v)[0]
            tokens = tokens[v]
            scores = {k: s[v] for k, s in scores.items()}
            accept_z = np.ones(tokens.shape[0], bool)
        else:
            accept_z = accept_full

        # ---- host-side bookkeeping for round R ----
        # dedup on CANONICALIZED token rows (canonical_keys), then build
        # strings only for the survivors: at the high duplicate rates of
        # collapsed models this skips >95% of the python string work vs
        # deduping on rendered strings.
        keys = list(canonical_keys(tokens))
        # runtime miscompile canary: a tape-corruption class collapses
        # within-round uniqueness; on a trip, flip to the XLA arm,
        # discard this round AND the pre-dispatched in-flight rounds
        # (they ran the suspect program), and continue — the candidate
        # stream stays unbiased (fresh fold_in keys, i.i.d. draws)
        if beam_canary_check(cfg, model, len(keys), len(set(keys)),
                             context=f"campaign round {round_ix}"):
            inflight.clear()
            continue
        keep = np.empty(tokens.shape[0], bool)
        for i, rb in enumerate(keys):
            if rb in seen:
                keep[i] = False
            else:
                keep[i] = True
                seen.add(rb)
        kept_tokens = tokens[keep].astype(np.int32)
        peptides = dataset.idx2sentences(kept_tokens,
                                         print_special_tokens=False)
        H, uH, charge = modlamp_from_tokens(kept_tokens,
                                            dataset.vocab.itos)
        slot_idx = (np.nonzero(keep)[0] if slots is None
                    else slots[keep])
        store["peptide"].extend(peptides)
        store["z"].append(_gather_z_rows_async(z_d, slot_idx))
        store["accept_z"].append(accept_z[keep])
        store["H"].append(H)
        store["uH"].append(uH)
        store["charge"].append(charge)
        for k, v in scores.items():
            score_store.setdefault(k, []).append(v[keep])
        n_total += int(keep.sum())
        n_accept += int(accept_z[keep].sum())
        n_cand_seen += n_candidates
        n_accept_z_seen += int(accept_full.sum())
        # Rate denominators are the CANDIDATES DRAWN in both decode modes,
        # so decode-all and accepted-only print comparable numbers. (The
        # reference literally divides by its accumulated post-dedup row
        # count, sample_pipeline.py:319-322 — at its low duplicate rates
        # the two definitions coincide; the serial fallback loop below
        # keeps the reference-literal form.)
        _log_round_rates(n_accept_z_seen, n_accept, n_cand_seen,
                         keep.size - int(keep.sum()))
        if n_total >= args.n_samples_acc and n_accept >= args.n_samples_acc:
            break

    df = pd.DataFrame({
        "peptide": store["peptide"],
        "z": list(_materialize_z(store["z"])),
        "accept_z": np.concatenate(store["accept_z"]),
        **{k: np.concatenate(v) for k, v in score_store.items()},
        "H": np.concatenate(store["H"]),
        "uH": np.concatenate(store["uH"]),
        "charge": np.concatenate(store["charge"]),
    })
    df["accept"] = df["accept_z"]
    return df


def _serial_sampling_loop(cfg, args, model, params, dataset, Q, key,
                          round_size):
    """Reference-shaped strict round-by-round loop (the hw.fused_rounds=0
    fallback path)."""
    samples = pd.DataFrame(columns=["peptide"])

    def is_finished(df, min_accepted):
        return not (len(df) < min_accepted
                    or df["accept"].sum() < min_accepted)

    round_ix = 0
    while not is_finished(samples, args.n_samples_acc):
        round_ix += 1
        LOG.info("Round #%d (x%d candidates per dispatch)", round_ix,
                 round_size)
        new = one_sampling_round(cfg, model, params, dataset, Q,
                                 round_size,
                                 jax.random.fold_in(key, round_ix),
                                 fused=False)
        new = new.loc[new.peptide.drop_duplicates().index]
        new = new[~new["peptide"].isin(samples["peptide"])]
        samples = pd.concat([samples, new], ignore_index=True, sort=False)
        _log_round_rates(int(samples["accept_z"].sum()),
                         int(samples["accept"].sum()), len(samples),
                         round_size - new.shape[0])
    return samples
