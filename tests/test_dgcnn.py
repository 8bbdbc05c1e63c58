"""DGCNN family tests: graph/edge ops vs numpy, head contract, freeze masks
through the optimizer, and the training-driver integration.

The reference repo has no DGCNN — this family is beyond-reference surface
(models/dgcnn.py) built on the framework's own kNN/gather formulations, so
these tests pin OUR semantics rather than parity."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessing_tpu.models import DGCNN, FreezeFlags
from pointcloudprocessing_tpu.models.dgcnn import (
    dgcnn_for_width,
    edge_features,
    knn_graph,
)

TINY = dict(
    k=8,
    edge_widths=(8, 16),
    emb_width=32,
    exact_knn=True,
)


def _cloud(b=2, n=64, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, n, 3)).astype(np.float32)
    )


def test_knn_graph_matches_numpy():
    """Exact-mode graph indices = brute-force numpy kNN (self included, as
    in the canonical DGCNN implementations)."""
    x = _cloud(b=2, n=40, seed=3)
    idx = jax.jit(lambda x: knn_graph(x, 5, exact=True))(x)
    assert idx.shape == (2, 40, 5)
    pts = np.asarray(x)
    for b in range(2):
        for i in range(40):
            d = np.sum((pts[b] - pts[b, i]) ** 2, -1)
            expect = set(np.argsort(d, kind="stable")[:5].tolist())
            got = set(np.asarray(idx[b, i]).tolist())
            assert got == expect, (b, i, got, expect)
            assert i in got  # self edge


def test_edge_features_semantics():
    """Edge tensor rows are [x_i ++ (x_j - x_i)] for each graph edge."""
    x = _cloud(b=1, n=16, seed=4)
    idx = knn_graph(x, 4, exact=True)
    e = jax.jit(edge_features)(x, idx)
    assert e.shape == (1, 16, 4, 6)
    pts = np.asarray(x[0])
    for i in range(16):
        for slot in range(4):
            j = int(idx[0, i, slot])
            np.testing.assert_allclose(np.asarray(e[0, i, slot, :3]), pts[i],
                                       rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(e[0, i, slot, 3:]), pts[j] - pts[i],
                rtol=1e-5, atol=1e-6,
            )


def test_forward_contract():
    """Output dict matches the PointNet head contract: shapes, softmax rows,
    identity se3, and heads subsetting skipping the seg head."""
    model = DGCNN(num_classes=5, num_parts=4, **TINY)
    x = _cloud()
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), x
    )
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert out["classification_output"].shape == (2, 5)
    assert out["segmentation_output"].shape == (2, 64, 4)
    assert out["se3"].shape == (2, 3, 3)
    np.testing.assert_allclose(
        np.sum(out["classification_output"], -1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.sum(out["segmentation_output"], -1), 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(out["se3"], np.eye(3)[None].repeat(2, 0))

    subset = jax.jit(
        lambda v, x: model.apply(
            v, x, train=False, heads=("classification_output",)
        )
    )(variables, x)
    assert set(subset) == {"classification_output"}
    np.testing.assert_allclose(
        subset["classification_output"], out["classification_output"],
        rtol=1e-6,
    )


def test_freeze_masks_through_optimizer():
    """The classification-pretrain stage freeze must leave every mlp_seg_*
    param untouched after an optimizer step while the trunk and cls head
    move — the same freeze_label_tree machinery as the other families."""
    from pointcloudprocessing_tpu.core.config import LearningConfig
    from pointcloudprocessing_tpu.train import steps as steps_lib

    model = DGCNN(num_classes=3, num_parts=4, **TINY)
    freeze = FreezeFlags(segmentation_head=True)
    state, optimizer = steps_lib.init_train_state(
        model, jax.random.key(0), 64, LearningConfig(rate=1e-2), freeze,
        batch_size=2,
    )
    step = steps_lib.make_train_step(
        model, optimizer, (1.0, 0.0, 0.0), freeze, (0.0, 0.0, 0.0)
    )
    x = _cloud(b=2, n=64, seed=1)
    targets = {
        "classification_output": jnp.array([0, 2], jnp.int32),
        "segmentation_output": jnp.zeros((2, 64), jnp.int32),
        "se3": jnp.broadcast_to(jnp.eye(3), (2, 3, 3)),
    }
    old_params = jax.device_get(state.params)  # the step donates state
    new_state, logs = step(state, x, targets, jax.random.key(2))
    assert np.isfinite(float(logs["loss"]))

    moved, held = [], []
    flat_old = jax.tree_util.tree_flatten_with_path(old_params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(new_state.params)[0])
    for path, old in flat_old:
        top = path[0].key
        changed = bool(np.any(np.asarray(old) != np.asarray(flat_new[path])))
        (held if top.startswith("mlp_seg") else moved).append((top, changed))
    assert all(not c for _, c in held), [t for t, c in held if c]
    assert any(c for _, c in moved)


@pytest.mark.slow  # fast-lane budget (VERDICT r3 item 8): covered by faster kin + slow lane
def test_train_profile_dgcnn_e2e(tmp_path):
    """Full driver run with params.model='dgcnn': both stages train, history
    has the exact Keras keys, and checkpoints + StableHLO + ONNX land (the
    native opset-13 writer covers this family since round 4)."""
    from test_train_profile import make_config
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    config_path = make_config(tmp_path, epochs=2)
    with open(config_path) as f:
        cfg = json.load(f)
    cfg["params"]["model"] = "dgcnn"
    with open(config_path, "w") as f:
        json.dump(cfg, f)

    tp = TrainProfile(config_path, log_to_file=False)
    tp.steps_per_dispatch = 2
    histories = tp.train()
    assert set(histories) == {"classification_pretrain", "final"}
    h = histories["final"]
    assert len(h["loss"]) == 2
    assert all(np.isfinite(v) for v in h["loss"])
    stage_dir = tmp_path / "models" / "tiny" / "final"
    assert (stage_dir / "best").is_dir()
    assert (stage_dir / "tiny_final.stablehlo").exists()
    assert (stage_dir / "tiny_final.onnx").exists()


def test_bf16_mode_runs():
    model = DGCNN(num_classes=3, num_parts=4, dtype=jnp.bfloat16, **TINY)
    x = _cloud()
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), x
    )
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    # heads stay f32 regardless of trunk dtype
    assert out["classification_output"].dtype == jnp.float32
    assert out["segmentation_output"].dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out["segmentation_output"])))


def test_for_width_clamps():
    assert dgcnn_for_width(3, 4, 8).k == 8
    canonical = dgcnn_for_width(3, 4, 1024)
    assert canonical.k == 20
    assert canonical.edge_widths == (64, 64, 128, 256)


def test_factored_edge_impl_matches_reference():
    """The factored edge block (p_i + q_j split kernel, relu-max collapse
    under fixed BN stats) computes the same function as the literal edge-
    tensor dataflow, from the same parameter tree, in every mode."""
    kwargs = dict(num_classes=5, num_parts=4, **TINY)
    ref = DGCNN(edge_impl="reference", **kwargs)
    fac = DGCNN(edge_impl="factored", **kwargs)
    x = _cloud(b=2, n=64, seed=7)

    v_ref = ref.init(jax.random.key(0), x, train=False)
    v_fac = fac.init(jax.random.key(0), x, train=False)
    paths_ref = [p for p, _ in jax.tree_util.tree_flatten_with_path(v_ref)[0]]
    paths_fac = [p for p, _ in jax.tree_util.tree_flatten_with_path(v_fac)[0]]
    assert paths_ref == paths_fac  # checkpoint-compatible both ways

    # inference (running stats -> collapsed max path)
    out_ref = jax.jit(lambda v, x: ref.apply(v, x, train=False))(v_ref, x)
    out_fac = jax.jit(lambda v, x: fac.apply(v, x, train=False))(v_ref, x)
    for head in ("classification_output", "segmentation_output"):
        np.testing.assert_allclose(
            np.asarray(out_ref[head]), np.asarray(out_fac[head]),
            rtol=1e-4, atol=1e-5,
        )

    # training (batch stats over the exact edge population) — outputs AND
    # the BN moment updates must agree
    rngs = {"dropout": jax.random.key(3)}
    (tr_ref, st_ref) = ref.apply(
        v_ref, x, train=True, mutable=["batch_stats"], rngs=rngs
    )
    (tr_fac, st_fac) = fac.apply(
        v_ref, x, train=True, mutable=["batch_stats"], rngs=rngs
    )
    np.testing.assert_allclose(
        np.asarray(tr_ref["segmentation_output"]),
        np.asarray(tr_fac["segmentation_output"]),
        rtol=1e-4, atol=1e-5,
    )
    flat_ref = jax.tree_util.tree_flatten_with_path(st_ref)[0]
    flat_fac = dict(jax.tree_util.tree_flatten_with_path(st_fac)[0])
    for path, val in flat_ref:
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(flat_fac[path]),
            rtol=1e-4, atol=1e-6, err_msg=str(path),
        )

    # frozen trunk in train mode (running stats -> collapse even in train)
    fr = FreezeFlags(shared_network=True)
    (fz_ref, _) = ref.apply(
        v_ref, x, train=True, freeze=fr, mutable=["batch_stats"], rngs=rngs
    )
    (fz_fac, _) = fac.apply(
        v_ref, x, train=True, freeze=fr, mutable=["batch_stats"], rngs=rngs
    )
    np.testing.assert_allclose(
        np.asarray(fz_ref["segmentation_output"]),
        np.asarray(fz_fac["segmentation_output"]),
        rtol=1e-4, atol=1e-5,
    )


def test_unknown_edge_impl_raises():
    """A typo like edge_impl='factoredd' must error, not silently run the
    slow literal dataflow (advisor finding, round 3)."""
    model = DGCNN(num_classes=5, num_parts=4, edge_impl="factoredd", **TINY)
    with pytest.raises(ValueError, match="edge impl"):
        model.init(jax.random.key(0), _cloud(b=1, n=32, seed=0), train=False)


def test_static_graph_single_layer_matches_dynamic():
    """With ONE EdgeConv the static (input-space) and dynamic graphs are the
    same graph, so the opt-in must be a pure refactor there: identical
    outputs."""
    kwargs = dict(num_classes=3, num_parts=4, k=6, edge_widths=(8,),
                  emb_width=16, exact_knn=True)
    dyn = DGCNN(graph="dynamic", **kwargs)
    sta = DGCNN(graph="static", **kwargs)
    x = _cloud(b=2, n=48, seed=11)
    v = dyn.init(jax.random.key(2), x, train=False)
    out_d = jax.jit(lambda v, x: dyn.apply(v, x, train=False))(v, x)
    out_s = jax.jit(lambda v, x: sta.apply(v, x, train=False))(v, x)
    for head in ("classification_output", "segmentation_output"):
        np.testing.assert_allclose(
            np.asarray(out_d[head]), np.asarray(out_s[head]),
            rtol=1e-6, atol=1e-7,
        )


def test_static_graph_builds_one_graph(monkeypatch):
    """graph='static' runs knn_graph ONCE for the whole trunk (that is the
    point: four PartialReduce calls collapse to one); 'dynamic' runs it per
    EdgeConv."""
    import pointcloudprocessing_tpu.models.dgcnn as dgcnn_mod

    calls = {"n": 0}
    real = dgcnn_mod.knn_graph

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(dgcnn_mod, "knn_graph", counting)
    x = _cloud(b=1, n=32, seed=5)

    sta = DGCNN(num_classes=3, num_parts=4, graph="static", **TINY)
    v = sta.init(jax.random.key(0), x, train=False)
    calls["n"] = 0
    sta.apply(v, x, train=False)  # eager apply so the counter sees traces
    assert calls["n"] == 1

    dyn = DGCNN(num_classes=3, num_parts=4, graph="dynamic", **TINY)
    calls["n"] = 0
    dyn.apply(v, x, train=False)
    assert calls["n"] == len(TINY["edge_widths"])


def test_static_graph_trains():
    """Train-mode forward + gradients stay finite through the shared-graph
    trunk (the gathers see the same idx in every layer)."""
    model = DGCNN(num_classes=3, num_parts=4, graph="static", **TINY)
    x = _cloud(b=2, n=64, seed=9)
    v = model.init(jax.random.key(1), x, train=False)

    def loss(params):
        out, _ = model.apply(
            {**v, "params": params}, x, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(3)},
        )
        return jnp.sum(out["classification_output"] ** 2) + jnp.sum(
            out["segmentation_output"] ** 2
        )

    g = jax.jit(jax.grad(loss))(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_unknown_graph_raises():
    model = DGCNN(num_classes=3, num_parts=4, graph="staticc", **TINY)
    with pytest.raises(ValueError, match="graph"):
        model.init(jax.random.key(0), _cloud(b=1, n=32), train=False)
