"""Follow-up: is lo itself zero on TPU (XLA folding f32(bf16(x)) -> x)?"""

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


@jax.jit
def lo_mag(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.max(jnp.abs(lo.astype(jnp.float32)))


@jax.jit
def e_barrier_hi(x, fi):
    c = x.shape[-1]
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    oh = jax.nn.one_hot(fi, x.shape[1], dtype=jnp.bfloat16)
    both = jnp.einsum("bgn,bnc->bgc", oh, jnp.concatenate([hi, lo], axis=-1))
    return both[..., :c].astype(jnp.float32) + both[..., c:].astype(jnp.float32)


print(f"max|lo| plain jit: {float(lo_mag(x32)):.3e} "
      f"(expect ~{21 * 4 * 2**-9:.2e} if NOT folded)", flush=True)
got = e_barrier_hi(x32, flat).reshape(4, 128, 16, 64)
rel = float(jnp.max(jnp.abs(got - want))) / denom
print(f"e_barrier_hi: rel={rel:.3e}  ({'OK' if rel <= 2**-15 else 'LOST-LO'})",
      flush=True)
