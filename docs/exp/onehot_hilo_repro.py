"""Repro for the one-hot gather f32 hi/lo acceptance failure (round 4).

check_onehot_gather measures 2.6e-3 rel error on hardware against the
2^-15 design bound — exactly single-bf16-pass magnitude, i.e. the lo
correction is lost somewhere between the jnp program and the executable.
Candidates raced here:

  a) shipped single-einsum-over-concat formulation (ops/gather.py)
  b) two separate einsums (hi and lo contracted independently)
  c) shipped form with an optimization_barrier on (hi, lo)
  d) f32 one-hot einsum with precision="highest"
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(7)
x32 = jnp.asarray(rng.normal(size=(4, 512, 64)).astype(np.float32) * 21.0)
idx = jnp.asarray(rng.integers(0, 512, (4, 128, 16)).astype(np.int32))
flat = idx.reshape(4, -1)
want = jnp.take_along_axis(x32, flat[..., None], axis=1).reshape(4, 128, 16, 64)
denom = float(jnp.max(jnp.abs(want)))


def _oh(fi, n, dtype):
    return jax.nn.one_hot(fi, n, dtype=dtype)


@jax.jit
def a_single_einsum(x, fi):
    c = x.shape[-1]
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    both = jnp.einsum("bgn,bnc->bgc", _oh(fi, x.shape[1], jnp.bfloat16),
                      jnp.concatenate([hi, lo], axis=-1))
    return both[..., :c].astype(jnp.float32) + both[..., c:].astype(jnp.float32)


@jax.jit
def b_two_einsums(x, fi):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    oh = _oh(fi, x.shape[1], jnp.bfloat16)
    ghi = jnp.einsum("bgn,bnc->bgc", oh, hi).astype(jnp.float32)
    glo = jnp.einsum("bgn,bnc->bgc", oh, lo).astype(jnp.float32)
    return ghi + glo


@jax.jit
def c_barrier(x, fi):
    c = x.shape[-1]
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    hi, lo = jax.lax.optimization_barrier((hi, lo))
    both = jnp.einsum("bgn,bnc->bgc", _oh(fi, x.shape[1], jnp.bfloat16),
                      jnp.concatenate([hi, lo], axis=-1))
    return both[..., :c].astype(jnp.float32) + both[..., c:].astype(jnp.float32)


@jax.jit
def d_f32_highest(x, fi):
    oh = _oh(fi, x.shape[1], jnp.float32)
    return jnp.einsum("bgn,bnc->bgc", oh, x, precision="highest")


for name, fn in (("a_single_einsum", a_single_einsum),
                 ("b_two_einsums", b_two_einsums),
                 ("c_barrier", c_barrier),
                 ("d_f32_highest", d_f32_highest)):
    got = fn(x32, flat).reshape(4, 128, 16, 64)
    rel = float(jnp.max(jnp.abs(got - want))) / denom
    print(f"{name}: rel={rel:.3e}  ({'OK' if rel <= 2**-15 else 'LOST-LO'})",
          flush=True)
