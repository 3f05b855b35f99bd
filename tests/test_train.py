"""Training engine tests: loop runs, loss improves, checkpoints roundtrip."""

import dataclasses

import numpy as np
import pytest

from avtex.config import Config
from avtex.train import restore_checkpoint, save_checkpoint, train_video


@pytest.fixture
def tiny_cfg():
    return Config(enc_arch="resnet10", model_type=1, img_size=32,
                  window=4, train_stride=2, stride=2, n_negs=4,
                  batch_size=4, lr=0.05, epochs=2, seed=0,
                  early_stop_loss=1e-9)


@pytest.fixture
def tiny_video(rng):
    # moving gradient so successive segments are genuinely predictive
    t, h, w = 40, 24, 24
    yy, xx = np.mgrid[0:h, 0:w]
    vid = np.stack([np.sin(xx / 3 + i / 2) * 100 + 127 + yy
                    for i in range(t)])
    return np.clip(vid[..., None].repeat(3, -1), 0, 255).astype(np.uint8)


@pytest.mark.slow
def test_train_loop_runs_and_improves(tiny_cfg, tiny_video):
    state, history = train_video(tiny_cfg, tiny_video, epochs=3)
    assert len(history) == 3
    assert np.isfinite(history).all()
    assert history[-1] <= history[0] * 1.5  # not diverging


def test_checkpoint_roundtrip(tmp_path, tiny_cfg, tiny_video):
    state, history = train_video(tiny_cfg, tiny_video, epochs=1)
    path = save_checkpoint(str(tmp_path), "t", state.params, 1, "resnet10",
                           history[0], is_best=True)
    assert path.endswith("_best")
    payload = restore_checkpoint(path, state.params)
    assert payload["epoch"] == 1 and payload["arch"] == "resnet10"
    leaves_a = [np.asarray(x) for x in
                __import__("jax").tree.leaves(state.params)]
    leaves_b = [np.asarray(x) for x in
                __import__("jax").tree.leaves(payload["state"])]
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(a, b)


def test_lr_schedule_decays_every_lr_steps():
    """StepLR semantics: /10 at EVERY lr_steps epochs (main.py:446,474),
    not only once — epochs past 2*lr_steps must run at lr*0.01."""
    from avtex.config import Config
    from avtex.train.loop import make_lr_schedule
    cfg = Config(lr=0.1, lr_steps=3)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(0.1)
    assert float(sched(3 * 10)) == pytest.approx(0.01)
    assert float(sched(6 * 10)) == pytest.approx(0.001)
    assert float(sched(7 * 10)) == pytest.approx(0.001)


def test_resume_missing_checkpoint_raises(tiny_cfg, tiny_video):
    """A typoed --resume path must fail loudly (reference main.py:357
    asserts), not silently retrain from scratch over the checkpoints."""
    from avtex.train.loop import train_video
    with pytest.raises(FileNotFoundError, match="No checkpoint"):
        train_video(tiny_cfg, tiny_video, epochs=1,
                    resume="/nonexistent/ckpt.msgpack")


def test_resume_replays_uninterrupted_run(tmp_path, tiny_cfg, tiny_video):
    """Kill at epoch 2 of 3, resume from _latest: identical losses, params
    and optimizer step as the uninterrupted run (params+opt-state+schedule
    all survive; reference only saves state_dict, main.py:461-483)."""
    full_state, full_hist = train_video(tiny_cfg, tiny_video, epochs=3)

    _, h1 = train_video(tiny_cfg, tiny_video, epochs=2,
                        ckpt_dir=str(tmp_path), ckpt_name="r")
    latest = str(tmp_path / "r_latest")
    res_state, h2 = train_video(tiny_cfg, tiny_video, epochs=3,
                                resume=latest,
                                ckpt_dir=str(tmp_path), ckpt_name="r")
    assert len(h1) == 2 and len(h2) == 1
    np.testing.assert_allclose(h1 + h2, full_hist, rtol=1e-5)
    assert int(res_state.step) == int(full_state.step)
    import jax
    for a, b in zip(jax.tree.leaves(full_state.params),
                    jax.tree.leaves(res_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_per_epoch_best_checkpointing(tmp_path, tiny_cfg, tiny_video):
    _, hist = train_video(tiny_cfg, tiny_video, epochs=2,
                          ckpt_dir=str(tmp_path), ckpt_name="b")
    assert (tmp_path / "b_latest").exists()
    assert (tmp_path / "b_best").exists()
    payload = restore_checkpoint(str(tmp_path / "b_latest"), None)
    assert payload["epoch"] == 2
    assert payload["best_loss"] == pytest.approx(min(hist), rel=1e-6)
    assert "opt_state" not in payload  # dropped without a template


def test_start_epoch_flag(tiny_cfg, tiny_video):
    cfg = dataclasses.replace(tiny_cfg, start_epoch=1)
    _, hist = train_video(cfg, tiny_video, epochs=3)
    assert len(hist) == 2  # epochs 1 and 2


@pytest.mark.slow
def test_early_stop(tiny_video):
    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32, window=4,
                 train_stride=2, stride=2, n_negs=4, batch_size=4,
                 early_stop_loss=1e6)  # stops after first epoch
    state, history = train_video(cfg, tiny_video, epochs=10)
    assert len(history) == 1


def test_data_pipeline_batch_contract(tiny_video):
    from avtex.data.pipeline import SegmentBatches
    data = SegmentBatches(tiny_video, window=4, stride=2, n_negs=4,
                          batch_size=4, seed=0)
    batch = next(data.epoch())
    assert batch["q_frames"].shape[1:] == (4, 24, 24, 3)
    assert batch["t_frames"].shape[1] == 5  # 1 pos + 4 negs
    # positive is the next segment's window
    q0 = int(batch["q_ids"][0])
    np.testing.assert_array_equal(batch["t_frames"][0, 0],
                                  data.windows[q0 + 1])


@pytest.mark.slow
def test_single_batch_overfit(tiny_video):
    """The decisive learnability check: loss must collapse on one batch."""
    import jax
    import jax.numpy as jnp
    import optax
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.data.pipeline import SegmentBatches
    from avtex.data.preprocess import preprocess_clip

    model = ContrastiveTextures(arch="resnet10", model_type=1, temp=0.1)
    data = SegmentBatches(tiny_video, window=4, stride=2, n_negs=4,
                          batch_size=4, seed=0, drop_last=True)
    batch = next(data.epoch())
    qf = jnp.asarray(batch["q_frames"])
    tf = jnp.asarray(batch["t_frames"])

    def prep(q, t):
        x = preprocess_clip(q, size=24)
        tt = preprocess_clip(t.reshape((-1,) + t.shape[2:]), size=24)
        return x, tt.reshape(t.shape[:2] + tt.shape[1:])

    x, tx = prep(qf, tf)
    params = jax.jit(model.init)(jax.random.key(0), x, tx)
    opt = optax.sgd(0.1, momentum=0.9)
    ostate = opt.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(pp):
            q, tt = prep(qf, tf)
            logits = model.apply(pp, q, tt)
            return -jnp.mean(jax.nn.log_softmax(logits, -1)[:, 0])
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    loss = None
    for _ in range(250):
        params, ostate, loss = step(params, ostate)
    assert float(loss) < 0.2, f"failed to overfit one batch: {float(loss)}"


@pytest.mark.slow
def test_trained_model_learns_loop_structure(tmp_path):
    """Qualitative guard (reference product claim, validate.py:63-874): on
    a procedurally generated clip with a TRUE loop (frame t == frame t+P),
    training must (1) drive the InfoNCE loss well below its ln(1+negs)
    start, (2) raise the walk's positive-successor probability vs random
    init, and (3) concentrate jump targets on loop-equivalent segments
    (delta a multiple of P/S). Catches a model that compiles fast but
    learns nothing."""
    import jax
    from avtex.config import Config
    from avtex.synth.embeddings import precompute_embeddings_from_video
    from avtex.synth.engine import (num_synthesis_steps,
                                    synthesize_indices_host)
    from avtex.train import train_video
    from avtex.contrastive.model import ContrastiveTextures

    T, H, P = 64, 32, 24  # period P: frame t and t+P are identical
    yy, xx = np.mgrid[0:H, 0:H]
    # exact periodicity: phase from t mod P (2*pi*t/P rounds differently
    # at t and t+P in float, breaking bit-equality after quantization)
    phase = 2 * np.pi * (np.arange(T) % P) / P
    vid = np.clip(
        127 + 90 * np.sin(xx[None] / 5 + np.sin(phase)[:, None, None])
        * np.cos(yy[None] / 7 + np.cos(phase)[:, None, None]),
        0, 255)[..., None].repeat(3, -1).astype(np.uint8)
    assert np.array_equal(vid[0], vid[P])  # true loop point

    cfg = Config(enc_arch="resnet10", model_type=1, img_size=32, window=4,
                 stride=2, train_stride=2, n_negs=4, batch_size=8,
                 lr=0.05, seed=0, early_stop_loss=0.05)
    state, history = train_video(cfg, vid, epochs=80)
    # measured on this seed: 1.59 -> 0.73 at epoch 80 (a non-learning
    # model stays at ln(1+negs) = 1.61)
    assert history[-1] < 0.6 * history[0], history

    model = ContrastiveTextures(arch=cfg.enc_arch, model_type=1,
                                temp=cfg.temp)
    W, S = cfg.window, cfg.stride
    L = (T - W) // S
    steps = num_synthesis_steps(3 * T, W, S)

    def walk(params, th):
        q, t = precompute_embeddings_from_video(
            model, params, vid, W, S, L, img_size=32, batch_size=8)
        return synthesize_indices_host(q, t, steps, temp=cfg.temp,
                                       threshold=th, seed_id=2,
                                       rng=np.random.default_rng(0))

    trained = walk(state.params, 0.5)
    import jax.numpy as jnp
    from avtex.data.preprocess import preprocess_clip
    xp = preprocess_clip(jnp.zeros((1, W, 32, 32, 3), jnp.uint8), size=32)
    rand_params = jax.jit(model.init)(jax.random.key(1), xp, xp[:, None])
    rand = walk(rand_params, 0.5)
    # measured: 0.051 trained vs 0.034 random (1.5x) on this seed
    assert trained.pos_prob.mean() > 1.25 * rand.pos_prob.mean(), (
        trained.pos_prob.mean(), rand.pos_prob.mean())

    # jump targets concentrate on loop-equivalent segments (delta a
    # multiple of P/S) MORE than a random-embedding walk's do (chance
    # rate ~4/2L; measured 0.128 trained vs ~0.07 random on this seed)
    def on_loop_frac(r):
        prev = np.concatenate([[r.seed_id], r.indices[:-1]])
        deltas = (r.indices - (prev + 1))[r.jumps.astype(bool)]
        return (np.mean(deltas % (P // S) == 0) if len(deltas) else 0.0)

    assert on_loop_frac(trained) > on_loop_frac(rand), (
        on_loop_frac(trained), on_loop_frac(rand))

    # threshold monotonicity: tighter threshold -> fewer or equal jumps
    tight = walk(state.params, 0.1)
    loose = walk(state.params, 0.9)
    assert tight.jumps.sum() <= loose.jumps.sum(), (
        tight.jumps.sum(), loose.jumps.sum())


@pytest.mark.slow
def test_remat_policy_matches_blanket_remat():
    """resnet3d.REMAT_POLICY = save_only_these_names('conv_out') (the
    structured-remat variant A/B'd by tools/train_ab.py) must produce
    the same train step as blanket per-bottleneck remat to bf16-rounding
    tolerance: rematerialization changes WHAT the backward saves, never
    the math. Guards the checkpoint_name tags in SFBottleneck against
    silently detaching from the policy (a renamed tag would make the
    policy save nothing and this would still pass numerically — so also
    asserts the tagged name exists in the jaxpr)."""
    import jax
    import jax.numpy as jnp

    from avtex.contrastive.model import ContrastiveTextures
    from avtex.nn import resnet3d, slowfast
    from avtex.train.loop import create_state, make_train_step

    g = np.random.default_rng(0)
    batch = {
        "q_frames": (g.random((2, 4, 32, 32, 3)) * 255).astype(np.uint8),
        "t_frames": (g.random((2, 3, 4, 32, 32, 3)) * 255
                     ).astype(np.uint8),
    }
    cfg = Config(enc_arch="slowfast", model_type=1, img_size=32, window=4,
                 stride=2, train_stride=2, n_negs=2, batch_size=2, lr=0.01)
    model = ContrastiveTextures(arch="slowfast", model_type=1,
                                temp=cfg.temp, remat=True)
    state = create_state(model, cfg, batch, steps_per_epoch=10,
                             slowfast=True)
    db = {k: jnp.asarray(v) for k, v in batch.items()}

    # the tag the policy keys on must be present in the traced program
    import jax.numpy as _jnp
    sf = slowfast.SlowFastR50(norm="group")
    sl = _jnp.zeros((1, 8, 32, 32, 3))
    fa = _jnp.zeros((1, 32, 32, 32, 3))
    p = jax.eval_shape(sf.init, jax.random.key(0), sl, fa)
    jaxpr = jax.make_jaxpr(
        lambda pp: sf.apply(pp, sl, fa))(p)
    assert "conv_out" in str(jaxpr), "checkpoint_name tag missing"

    out = {}
    for name, pol in (
            ("full", None),
            ("convs",
             jax.checkpoint_policies.save_only_these_names("conv_out"))):
        resnet3d.REMAT_POLICY = pol
        try:
            step = make_train_step(model, cfg.img_size, slowfast=True)
            st, m = step(state, db, jax.random.key(0))
        finally:
            resnet3d.REMAT_POLICY = None
        out[name] = (float(m["loss"]), st.params)
    l1, p1 = out["full"]
    l2, p2 = out["convs"]
    assert np.isfinite([l1, l2]).all()
    # bf16 trunk: one-ulp-scale divergence between compilations is
    # expected (measured 1.7e-3 relative); structural bugs are orders
    # larger (the pre-fix backwarp diverged by 2.7 absolute).
    assert abs(l1 - l2) / abs(l1) < 5e-3, (l1, l2)
    import jax as _jax
    mx = max(_jax.tree.leaves(_jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, p2)))
    assert mx < 5e-2, mx
