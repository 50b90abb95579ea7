"""SPMD data-parallel semantics on an 8-device virtual CPU mesh
(the test pattern SURVEY.md §4 prescribes; replaces DDP integration tests).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yolosomi_tpu.parallel.mesh import batch_sharding, create_mesh, replicate_tree, shard_batch


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual CPU devices"
    return create_mesh(devices=jax.devices()[:8])


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")


def test_shard_batch_places_on_data_axis(mesh):
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    sharded = shard_batch({"x": x}, mesh)["x"]
    assert sharded.sharding.spec[0] == "data"
    np.testing.assert_allclose(np.asarray(sharded), x)


def test_global_mean_matches_host(mesh):
    """A jitted global-batch mean over the sharded axis equals the host mean
    (the property that makes BN stats SyncBN-equivalent)."""
    x = np.random.default_rng(0).standard_normal((16, 8)).astype(np.float32)
    xs = shard_batch({"x": x}, mesh)["x"]

    @jax.jit
    def mean(v):
        return v.mean(axis=0)

    np.testing.assert_allclose(np.asarray(mean(xs)), x.mean(0), rtol=1e-5)


def test_data_parallel_grad_matches_single_device(mesh):
    """Gradients of a sharded loss == single-device gradients (the DDP
    all-reduce contract, reference train.py:266-267)."""
    w = np.random.default_rng(1).standard_normal((8, 4)).astype(np.float32)
    x = np.random.default_rng(2).standard_normal((16, 8)).astype(np.float32)
    y = np.random.default_rng(3).standard_normal((16, 4)).astype(np.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(jnp.asarray(w), jnp.asarray(x), jnp.asarray(y))

    with mesh:
        ws = replicate_tree(jnp.asarray(w), mesh)
        xs = shard_batch({"x": x, "y": y}, mesh)
        g_sharded = jax.jit(jax.grad(loss))(ws, xs["x"], xs["y"])
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single), rtol=1e-4, atol=1e-5)


def test_tiny_model_train_step_on_mesh(mesh):
    """Full train step (model fwd/bwd + optimizer + EMA) over the 8-device
    mesh: loss finite, params update, state stays replicated."""
    from flax import linen as nn

    from yolosomi_tpu.engine.optim import make_optimizer
    from yolosomi_tpu.engine.trainer import create_train_state, make_train_step
    from yolosomi_tpu.utils.config import DEFAULT_HYP

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            return [x[:, ::2, ::2, :][..., None, :8][..., :1, :]]  # fake single-level head

    model = Tiny()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), train=False)

    def loss_fn(preds, targets):
        loss = sum(jnp.mean(p**2) for p in preds)
        return loss, jnp.zeros(3)

    optimizer = make_optimizer(dict(DEFAULT_HYP), nb=4, epochs=2, batch_size=8)
    state = create_train_state(dict(variables), optimizer)
    step = make_train_step(model, loss_fn, optimizer, mesh=mesh)

    images = np.random.default_rng(0).standard_normal((8, 8, 8, 3)).astype(np.float32)
    targets = np.zeros((8, 4, 5), np.float32)
    # snapshot before the step: the step donates its input state buffers
    before = jax.tree_util.tree_leaves(jax.device_get(variables["params"]))

    with mesh:
        state = replicate_tree(state, mesh)
        batch = shard_batch({"images": images, "targets": targets}, mesh)
        new_state, metrics = step(state, batch["images"], batch["targets"])

    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
    assert int(new_state.step) == 1
    assert int(new_state.ema.updates) == 1


def test_spatial_sharding_conv_halo_exchange():
    """H-sharded convolution over the 'model' axis must match the
    replicated result — XLA inserts the halo exchange (the capability
    SURVEY.md §5.7 adds beyond the reference)."""
    from flax import linen as nn

    from yolosomi_tpu.parallel.mesh import create_mesh, shard_spatial

    mesh2 = create_mesh(devices=jax.devices()[:8], data=2, model=4)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            x = nn.Conv(4, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
            return x

    net = Net()
    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ref = net.apply(variables, jnp.asarray(x))

    with mesh2:
        xs = shard_spatial(jnp.asarray(x), mesh2)
        out = jax.jit(net.apply)(variables, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    # the output really was computed sharded
    assert len(out.sharding.device_set) >= 4


def test_spatial_sharding_output_parity():
    """--shard-spatial wiring (VERDICT r2 #8): Runner with H-sharded
    activations over the mesh 'model' axis produces the same detections
    as the unsharded path (XLA SPMD inserts the conv halo exchanges)."""
    from yolosomi_tpu.engine.runner import Runner

    base = Runner("yolov5n", None, nc=10, imgsz=128)
    sharded = Runner("yolov5n", None, nc=10, imgsz=128, spatial_shards=4)
    sharded.variables = base.variables  # identical weights

    rng = np.random.default_rng(0)
    x = rng.integers(0, 255, (2, 128, 128, 3), dtype=np.uint8)
    f_base = base.infer_fn(conf_thres=0.001, iou_thres=0.6, max_det=50)
    f_sh = sharded.infer_fn(conf_thres=0.001, iou_thres=0.6, max_det=50)
    out_base = np.asarray(f_base(base.variables, jnp.asarray(x)))
    out_sh = np.asarray(f_sh(sharded.variables, jnp.asarray(x)))
    assert sharded.spatial_mesh is not None
    np.testing.assert_allclose(out_sh, out_base, rtol=5e-2, atol=5e-2)
    # the kept detection set (conf>0 rows, box geometry) must agree tightly
    np.testing.assert_allclose(out_sh[..., 4] > 0, out_base[..., 4] > 0)


def test_multistep_sharded_matches_single_device(mesh):
    """Determinism across the mesh (VERDICT r2 #4): N train steps with the
    batch sharded over 8 devices produce the same params/EMA as the same N
    steps on one device — the psum-grad semantics match unsharded math."""
    from yolosomi_tpu.engine.optim import make_optimizer
    from yolosomi_tpu.engine.trainer import create_train_state, make_train_step
    from yolosomi_tpu.losses import ComputeLoss, pad_targets
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.utils.config import DEFAULT_HYP, find_config, load_model_cfg

    cfg = load_model_cfg(find_config("yolov5n"))
    cfg["nc"] = 4
    model, meta = build_model(cfg, nc=4)
    variables = init_model(model, meta, imgsz=64)
    hyp = dict(DEFAULT_HYP)
    loss_fn = ComputeLoss(meta, hyp)

    rng = np.random.default_rng(3)
    images = rng.standard_normal((8, 64, 64, 3)).astype(np.float32)
    labels = [np.array([[i % 4, 0.5, 0.5, 0.3, 0.3]], np.float32) for i in range(8)]
    targets = np.asarray(pad_targets(labels, 4))

    def run(n_steps, use_mesh):
        optimizer = make_optimizer(dict(hyp), nb=4, epochs=2, batch_size=8)
        state = create_train_state(jax.tree_util.tree_map(jnp.array, variables), optimizer)
        step = make_train_step(model, loss_fn, optimizer, mesh=use_mesh)
        losses = []
        if use_mesh is not None:
            with use_mesh:
                state = replicate_tree(state, use_mesh)
                batch = shard_batch({"images": images, "targets": targets}, use_mesh)
                for _ in range(n_steps):
                    state, m = step(state, batch["images"], batch["targets"])
                    losses.append(float(m["loss"]))
        else:
            for _ in range(n_steps):
                state, m = step(state, jnp.asarray(images), jnp.asarray(targets))
                losses.append(float(m["loss"]))
        return state, losses

    state_1, losses_1 = run(3, None)
    state_8, losses_8 = run(3, mesh)

    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-4)
    # tolerance: sharded psum reduces gradients in tree order, the
    # single-device program in row-major order — both correct f32
    # summations with different rounding, amplified ~3x through three
    # SGD+momentum updates (observed up to ~2e-3 abs on small-magnitude
    # head biases). Anything semantic (wrong psum scaling, missing
    # all-reduce) diverges by orders of magnitude more.
    p1 = jax.tree_util.tree_leaves(jax.device_get(state_1.params))
    p8 = jax.tree_util.tree_leaves(jax.device_get(state_8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=3e-3)
    e1 = jax.tree_util.tree_leaves(jax.device_get(state_1.ema.variables["params"]))
    e8 = jax.tree_util.tree_leaves(jax.device_get(state_8.ema.variables["params"]))
    for a, b in zip(e1, e8):
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=3e-3)


def test_channel_sharded_tp_forward_and_grads_match_replicated():
    """Tensor parallelism: conv out-channels sharded over 'model' (GSPMD
    inserts the all-gathers) must reproduce the replicated forward AND
    loss gradients — the tp leg of the driver contract's tp/sp/dp set."""
    from yolosomi_tpu.losses import ComputeLoss, pad_targets
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.parallel.mesh import channel_shard_tree, create_mesh
    from yolosomi_tpu.utils.config import DEFAULT_HYP, find_config, load_model_cfg

    mesh2 = create_mesh(devices=jax.devices()[:8], data=2, model=4)
    cfg = load_model_cfg(find_config("yolov5n"))
    model, meta = build_model(cfg, nc=4)
    variables = init_model(model, meta, imgsz=64)
    loss_fn = ComputeLoss(meta, dict(DEFAULT_HYP))

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    targets = jnp.asarray(
        pad_targets([np.array([[1, 0.5, 0.5, 0.3, 0.3]], np.float32)] * 2, 4)
    )

    def loss(v, x_, t_):
        preds = model.apply(v, x_, train=False)
        return loss_fn(preds, t_)[0]

    ref_fwd = model.apply(variables, x, train=False)
    ref_loss, ref_grads = jax.value_and_grad(loss)(variables, x, targets)

    with mesh2:
        v_tp = channel_shard_tree(variables, mesh2)
        # at least the wide conv kernels really are sharded
        kernels = [
            leaf for leaf in jax.tree_util.tree_leaves(v_tp["params"])
            if hasattr(leaf, "ndim") and leaf.ndim == 4 and leaf.shape[-1] >= 64
        ]
        assert kernels and any(len(k.sharding.device_set) >= 4 for k in kernels)
        tp_fwd = jax.jit(lambda v, x_: model.apply(v, x_, train=False))(v_tp, x)
        tp_loss, tp_grads = jax.jit(jax.value_and_grad(loss))(v_tp, x, targets)

    for a, b in zip(ref_fwd, tp_fwd):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(tp_loss), float(ref_loss), rtol=1e-5)
    ga = jax.tree_util.tree_leaves(jax.device_get(ref_grads["params"]))
    gb = jax.tree_util.tree_leaves(jax.device_get(tp_grads["params"]))
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)


def test_pipeline_parallel_2stage_matches_sequential():
    """Pipeline parallelism (the pp leg): backbone on stage 0, neck+head
    on stage 1, microbatches hopping over 'stage' via ppermute — raw head
    maps must equal the sequential forward for every microbatch."""
    from jax.sharding import Mesh

    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.parallel.pipeline import pipeline_infer, stage_payload_keys
    from yolosomi_tpu.utils.config import find_config, load_model_cfg

    cfg = load_model_cfg(find_config("yolov5n"))
    model, meta = build_model(cfg, nc=4)
    variables = init_model(model, meta, imgsz=64)
    split = 10  # v5 backbone (incl. SPPF) | neck+head
    keys = stage_payload_keys(model, split)
    assert keys == (4, 6), keys  # P3/P4 skips cross the boundary

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("stage",))
    M, mb = 3, 2
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.standard_normal((M * mb, 64, 64, 3)).astype(np.float32))

    fn = pipeline_infer(model, variables, mesh, split, imgsz=64, microbatch=mb)
    got = fn(variables, images)
    want = model.apply(variables, images, train=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)


def _pp_setup(n_stages, microbatch, batch=4, imgsz=64, seed=3):
    import optax

    from yolosomi_tpu.losses import ComputeLoss, pad_targets
    from yolosomi_tpu.models.yolo import build_model, init_model
    from yolosomi_tpu.parallel.pipeline import PipelineTrainer
    from yolosomi_tpu.utils.config import DEFAULT_HYP, find_config, load_model_cfg

    cfg = load_model_cfg(find_config("yolov5n"))
    model, meta = build_model(cfg, nc=4)
    variables = init_model(model, meta, imgsz=imgsz)
    loss_fn = ComputeLoss(meta, dict(DEFAULT_HYP))
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((batch, imgsz, imgsz, 3)).astype(np.float32)
    labels = [
        np.array([[i % 4, 0.5, 0.5, 0.3, 0.25], [(i + 1) % 4, 0.3, 0.6, 0.2, 0.2]], np.float32)
        for i in range(batch)
    ]
    targets = pad_targets(labels, 8)
    trainer = PipelineTrainer(
        model, variables, loss_fn, n_stages,
        devices=jax.devices()[:n_stages],
        optimizer=optax.sgd(1e-3), microbatch=microbatch,
    )
    return model, variables, loss_fn, images, targets, trainer


def test_pipeline_trainer_stage_partition_and_balance():
    """Stage-partitioned weights: per-device live-param bytes must drop to
    ~total/S (the HBM-scaling receipt the 2-stage inference demo lacked)."""
    from yolosomi_tpu.parallel.pipeline import balance_stages, split_variables

    model, variables, _, _, _, trainer = _pp_setup(n_stages=4, microbatch=2)
    per_dev = trainer.per_device_param_bytes()
    total = sum(per_dev)
    assert len(per_dev) == 4
    # balanced: no stage holds more than ~60% above the ideal quarter
    # (CNN heads are lumpy; the bound still proves real partitioning)
    assert max(per_dev) < 0.6 * total, per_dev
    # the shards reassemble to exactly the original pytree
    merged = trainer.merged_variables()
    want_leaves = jax.tree_util.tree_leaves(variables)
    got_leaves = jax.tree_util.tree_leaves(merged)
    assert len(want_leaves) == len(got_leaves)
    for a, b in zip(want_leaves, got_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # boundaries cover the layer list contiguously
    b = balance_stages(model, variables, 4)
    assert b[0] == 0 and b[-1] == len(model.layers) and list(b) == sorted(set(b))
    for s in range(4):
        assert split_variables(variables, b[s], b[s + 1])


def test_pipeline_trainer_matches_single_device_step():
    """GPipe train step parity: at microbatch == batch the pipeline's
    loss AND accumulated per-stage grads equal the single-device
    value_and_grad over the full graph (BN included) — proving the
    payload routing, the remat backward, and the cotangent hops."""
    from yolosomi_tpu.parallel.pipeline import PipelineTrainer

    model, variables, loss_fn, images, targets, _ = _pp_setup(n_stages=3, microbatch=4)
    trainer = PipelineTrainer(
        model, variables, loss_fn, 3, devices=jax.devices()[:3],
        optimizer=None, microbatch=4,
    )
    loss_pp = trainer.step(jnp.asarray(images), jnp.asarray(targets))

    def ref_loss(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            jnp.asarray(images), train=True, mutable=["batch_stats"],
        )
        return loss_fn(preds, jnp.asarray(targets))[0]

    want, ref_grads = jax.value_and_grad(ref_loss)(variables["params"])
    np.testing.assert_allclose(loss_pp, float(want), rtol=1e-5)
    # stitch the per-stage grads back together and compare leaf-for-leaf
    merged = {}
    for g in trainer._grads:
        merged.update(g)
    for k, sub in ref_grads.items():
        got = jax.device_get(merged[k])
        for a, b in zip(jax.tree_util.tree_leaves(sub), jax.tree_util.tree_leaves(got)):
            # same tolerance class as the tp grad-parity test above: the
            # remat backward reassociates f32 sums across stage boundaries
            np.testing.assert_allclose(b, np.asarray(a), rtol=1e-3, atol=1e-4)


def test_pipeline_trainer_microbatched_training_descends():
    """M=2 microbatches on 3 stages: losses stay finite and descend over
    a few optimizer steps (per-microbatch BN = the reference's DDP-default
    per-rank BN; exact parity is the M=1 test above)."""
    _, _, _, images, targets, trainer = _pp_setup(n_stages=3, microbatch=2)
    losses = [trainer.step(jnp.asarray(images), jnp.asarray(targets)) for _ in range(6)]
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0], losses
