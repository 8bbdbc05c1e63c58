"""Fast (Pallas-fused, BN-folded) inference path vs the reference flax model.

Runs in Pallas interpret mode on CPU; the same code path compiles to Mosaic
kernels on TPU (exercised by bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloudprocessing_tpu.models import PointNet
from pointcloudprocessing_tpu.models.fast_infer import make_fast_inference
from pointcloudprocessing_tpu.ops.pallas.chain import fused_chain_max, fold_bn

B, N, C, P = 2, 256, 23, 12


def test_fused_chain_max_matches_jnp(rng):
    x = jnp.asarray(rng.normal(size=(B, N, 64)).astype(np.float32))
    ws = [
        jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(128, 1024)).astype(np.float32) * 0.1),
    ]
    bs = [
        jnp.asarray(rng.normal(size=(64,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(128,)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(1024,)).astype(np.float32)),
    ]
    got = fused_chain_max(x, ws, bs)

    h = x
    for w, b in zip(ws, bs):
        h = jnp.maximum(h @ w + b, 0.0)
    want = jnp.max(h, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fold_bn_equivalence(rng):
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    gamma = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=16).astype(np.float32))
    mean = jnp.asarray(rng.normal(size=16).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, 16).astype(np.float32))

    want = gamma * ((x @ w) - mean) / jnp.sqrt(var + 1e-3) + beta
    wf, bf = fold_bn(w, gamma, beta, mean, var)
    np.testing.assert_allclose(np.asarray(x @ wf + bf), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("vanilla", [True, False])
def test_fast_inference_matches_model(vanilla, rng):
    model = PointNet(num_classes=C, num_parts=P, vanilla=vanilla)
    pts = jnp.asarray(rng.uniform(-4, 4, (B, N, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), pts, train=False)
    variables = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }

    want = model.apply(variables, pts, train=False)
    infer = make_fast_inference(variables, vanilla=vanilla)
    got = infer(pts)

    np.testing.assert_allclose(
        np.asarray(got["classification_output"]),
        np.asarray(want["classification_output"]),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["segmentation_output"]),
        np.asarray(want["segmentation_output"]),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got["se3"]), np.asarray(want["se3"]), atol=2e-4
    )


def test_fast_inference_after_training_stats(rng):
    """Folding must use updated (non-init) batch statistics correctly."""
    model = PointNet(num_classes=C, num_parts=P, vanilla=True)
    pts = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), pts, train=False)
    # run a few train-mode passes to move the BN stats off init
    vs = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    for i in range(3):
        _, upd = model.apply(
            vs, pts, train=True,
            rngs={"dropout": jax.random.key(i)},
            mutable=["batch_stats"],
        )
        vs = {"params": vs["params"], "batch_stats": upd["batch_stats"]}

    want = model.apply(vs, pts, train=False)
    got = make_fast_inference(vs, vanilla=True)(pts)
    np.testing.assert_allclose(
        np.asarray(got["segmentation_output"]),
        np.asarray(want["segmentation_output"]),
        atol=2e-4,
    )
