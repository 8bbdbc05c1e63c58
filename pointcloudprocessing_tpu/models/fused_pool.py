"""Fused ``dense -> BatchNorm -> relu -> global max-pool`` with a custom VJP.

Training is HBM-bound (measured: 135 Gflop but 5.7 GB accessed per b32 step
at ~900 GB/s — saturation). The three widest activations are the
(b, n, 1024) outputs of the chains that feed the global max-pools (both
T-Nets and the trunk's mlp_2_3, reference PointNet.py:236-248, 418-429);
autodiff materializes each of them several times (forward value, relu mask,
BN backward, incoming gradient).

This op exploits the max-pool's sparsity: only one point per (cloud,
channel) — the argmax winner — receives gradient through the pool, and the
dense part of the BatchNorm backward (the batch-statistics term that
touches every element) factors *through the matmul*:

    dpre = s * (dy - mean(dy) - xhat * mean(dy*xhat)),  s = gamma/sigma
    dx   = dpre @ W^T
         = [winner-sparse term] @ W^T  +  x @ (W diag(q) W^T)  +  const_row

so the backward needs no (b, n, C) gradient tensor at all: a (C_in, C_in)
matrix, per-channel scalars (winner sums), and one regenerated one-hot
intermediate for the sparse term. The forward stores only the argmax
indices and the winners' normalized values (b, C).

Numerics: exactly the autodiff gradient (same BN fast-variance formula) up
to float reassociation; validated against jax.grad in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _norm_scale(var, eps, dtype):
    return jax.lax.rsqrt((var + eps).astype(dtype))


#: test hook — force the Pallas path (interpret-mode on CPU) regardless of
#: backend/dtype so the dispatch branches can be validated everywhere.
_FORCE_PALLAS = False

def _use_pallas(cfg, x, kernel) -> bool:
    """TPU training path: keep every (b, n, C) intermediate in VMEM via the
    Pallas kernels (ops/pallas/pooled_chain.py). Only for batch-stats mode
    in bf16 on lane-aligned shapes — everything else (eval, frozen, f32
    parity mode, odd shapes, CPU) keeps the jnp formulation below.

    ``cfg[4]`` (optional, default True) is the caller's allow flag,
    threaded from ``PointNet(allow_pallas=...)``: the training driver sets
    it False when the step compiles under a MULTI-DEVICE GSPMD jit —
    pallas_call custom calls carry no SPMD partitioning rule, so GSPMD
    cannot shard through them. Single-device jit and shard_map-wrapped
    programs (per-shard execution, models/pipeline.py,
    steps.make_shardmap_train_multi_step) keep the kernels. An explicit
    per-model flag, not a mutable global: the dispatch is decided at trace
    time, and jit traces lazily/retraces on new shapes — globally-ordered
    mutation would be a latent mis-trace hazard."""
    use_running, _, _, dtype = cfg[:4]
    if len(cfg) > 4 and not cfg[4]:
        return False
    if use_running:
        return False
    if _FORCE_PALLAS:
        return True
    if dtype != jnp.bfloat16:
        return False
    from pointcloudprocessing_tpu.ops.pallas import pooled_chain

    if pooled_chain._interpret():
        return False
    b, n, c_in = x.shape
    return pooled_chain.supported(b, n, c_in, kernel.shape[1])


def _forward(cfg, x, kernel, scale, bias, run_mean, run_var):
    """Returns (pooled (b, c), batch_mean, batch_var, argmax, xhat_w)."""
    use_running, _, eps, dtype = cfg[:4]
    cdtype = dtype or x.dtype
    b, n, _ = x.shape

    if _use_pallas(cfg, x, kernel):
        from pointcloudprocessing_tpu.ops.pallas.pooled_chain import (
            pooled_chain_forward,
        )

        num = b * n
        xb = x.astype(cdtype)
        # batch statistics from the Gram matrix — no (b, n, C) pass:
        #   E[pre]   = (1^T x) W / N
        #   E[pre^2] = diag(W^T (x^T x) W) / N
        # x^T x is exact for bf16 inputs (single-pass products, f32
        # accumulation); the small (c_in, c_in) contractions are pinned to
        # full f32 precision — their E[pre^2] - E[pre]^2 cancellation would
        # otherwise inherit the default bf16-pass error.
        x2 = xb.reshape(-1, x.shape[-1])
        xsum = jnp.sum(x2.astype(jnp.float32), axis=0)
        gram = jax.lax.dot_general(
            x2, x2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        kf = kernel.astype(jnp.float32)
        with jax.default_matmul_precision("highest"):
            gw = gram @ kf  # (c_in, c)
            mean = (xsum @ kf) / num
        var = jnp.sum(gw * kf, axis=0) / num - jnp.square(mean)
        inv = _norm_scale(var, eps, jnp.float32)
        a = scale * inv
        c_row = bias - mean * a
        pooled, argmax = pooled_chain_forward(xb, kernel, a, c_row)
        # winner xhat reconstructs from the pooled output: y_w = pooled
        # wherever pooled > 0, and the backward gates on pooled > 0, so the
        # value where pooled == 0 (or gamma == 0) is never used.
        safe = jnp.where(scale == 0.0, 1.0, scale)
        xhat_w = jnp.where(scale == 0.0, 0.0, (pooled - bias) / safe)
        return pooled, mean, var, argmax, xhat_w.astype(jnp.float32)

    pre = jnp.dot(x.astype(cdtype), kernel.astype(cdtype))  # (b, n, C)
    if use_running:
        mean, var = run_mean, run_var
    else:
        # flax fast-variance convention: E[x^2] - E[x]^2 over (batch, points)
        pre32 = pre.astype(jnp.float32)
        mean = jnp.mean(pre32, axis=(0, 1))
        var = jnp.mean(jnp.square(pre32), axis=(0, 1)) - jnp.square(mean)
    inv = _norm_scale(var, eps, cdtype)
    xhat = (pre - mean.astype(cdtype)) * inv
    y = xhat * scale.astype(cdtype) + bias.astype(cdtype)
    r = jnp.maximum(y, 0.0)
    pooled = jnp.max(r, axis=1)  # (b, C)
    argmax = jnp.argmax(r, axis=1).astype(jnp.int32)  # (b, C)
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, r.shape, 1) == argmax[:, None, :]
    )
    xhat_w = jnp.sum(jnp.where(onehot, xhat, 0.0), axis=1)  # (b, C)
    return (
        pooled.astype(jnp.float32),
        mean.astype(jnp.float32),
        var.astype(jnp.float32),
        argmax,
        xhat_w.astype(jnp.float32),
    )


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def dense_bn_relu_max(cfg, x, kernel, scale, bias, run_mean, run_var):
    """cfg = (use_running: bool, momentum: float, eps: float, dtype|None,
    allow_pallas: bool = True) — the trailing flag is optional (4-tuples
    default to allowed) and gates the Pallas kernel dispatch; see
    _use_pallas for when callers must clear it (multi-device GSPMD jit).

    x (b, n, c_in) -> (pooled (b, c_out) f32, batch_mean, batch_var).
    In running-average mode the returned stats are the inputs unchanged.
    """
    pooled, mean, var, _, _ = _forward(cfg, x, kernel, scale, bias, run_mean, run_var)
    return pooled, mean, var


def _fwd(cfg, x, kernel, scale, bias, run_mean, run_var):
    pooled, mean, var, argmax, xhat_w = _forward(
        cfg, x, kernel, scale, bias, run_mean, run_var
    )
    residuals = (x, kernel, scale, pooled, mean, var, argmax, xhat_w)
    return (pooled, mean, var), residuals


def _bwd(cfg, residuals, cotangents):
    use_running, _, eps, dtype = cfg[:4]
    g_out, _, _ = cotangents  # stats cotangents are update-path only
    x, kernel, scale, pooled, mean, var, argmax, xhat_w = residuals
    cdtype = dtype or x.dtype
    b, n, c_in = x.shape
    c = kernel.shape[1]
    num = b * n

    inv = _norm_scale(var, eps, jnp.float32)  # (C,)
    s = scale * inv  # gamma/sigma

    # gradient reaches only the winners; relu gate: pooled > 0 <=> y_w > 0
    dy_w = g_out * (pooled > 0)  # (b, C)
    dbias = jnp.sum(dy_w, axis=0)
    dscale = jnp.sum(dy_w * xhat_w, axis=0)

    # winner-sparse dpre coefficient per (cloud, channel)
    coef = dy_w * s  # (b, C)

    if use_running:
        sum1 = sum2 = None
        m_small = const_row = dk_dense_term = None
    else:
        sum1 = jnp.sum(dy_w, axis=0)  # Sum dy
        sum2 = jnp.sum(dy_w * xhat_w, axis=0)  # Sum dy*xhat
        # dense batch-stats term, factored through the matmul (shared by
        # BOTH formulations below — one definition so the algebra cannot
        # drift between them):
        # D = -(1/N) * s * (sum1 + xhat * sum2)
        # D @ W^T = x @ M + const_row, with xhat = (x@W - mu) * inv
        q = -(s * sum2 * inv) / num  # (C,)
        m_small = (kernel * q[None, :]) @ kernel.T  # (c_in, c_in)
        const_row = (-(s * sum1) / num + mean * inv * s * sum2 / num) @ kernel.T

        def dk_dense_term(xsum, xtx):
            # dW dense part: x^T @ D = -(1/N)[ (x^T 1) (s sum1)^T
            #                + (x^T x W - (x^T 1) mu^T) diag(inv s sum2) ]
            return -(
                jnp.outer(xsum, s * sum1)
                + (xtx @ kernel - jnp.outer(xsum, mean))
                * (inv * s * sum2)[None, :]
            ) / num

    if _use_pallas(cfg, x, kernel):
        from pointcloudprocessing_tpu.ops.pallas.pooled_chain import (
            pooled_chain_backward,
        )

        # the kernel fuses the dense term into its dx tiles; xsum/xtx for
        # the dense dW term are one cheap (b*n, c_in) pass
        xb = x.astype(cdtype)
        x2 = xb.reshape(-1, x.shape[-1])
        xsum = jnp.sum(x2.astype(jnp.float32), axis=0)
        xtx = jax.lax.dot_general(
            x2, x2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dx, dk_sparse = pooled_chain_backward(
            xb, kernel, coef, argmax, m_small, const_row
        )
        return (
            dx.astype(x.dtype),
            (dk_sparse + dk_dense_term(xsum, xtx)).astype(kernel.dtype),
            dscale.astype(scale.dtype),
            dbias.astype(scale.dtype),
            jnp.zeros_like(mean),
            jnp.zeros_like(var),
        )

    # sparse term: A[b, i, c] = onehot * coef -> contributes to dx and dW
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (b, n, c), 1) == argmax[:, None, :]
    )
    a_mat = jnp.where(onehot, coef[:, None, :], 0.0).astype(cdtype)
    kt = kernel.astype(cdtype).T
    dx = jnp.einsum("bnc,cd->bnd", a_mat, kt)
    dkernel = jnp.einsum(
        "bnd,bnc->dc", x.astype(cdtype), a_mat
    ).astype(jnp.float32)

    if not use_running:
        dx = dx + x @ m_small.astype(x.dtype) + const_row.astype(x.dtype)[None, None, :]
        xsum = jnp.sum(x, axis=(0, 1))  # (c_in,)
        xtx = jnp.einsum("bnd,bne->de", x, x)  # (c_in, c_in)
        dkernel = dkernel + dk_dense_term(xsum, xtx)

    return (
        dx.astype(x.dtype),
        dkernel.astype(kernel.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(scale.dtype),
        jnp.zeros_like(mean),  # running stats are non-differentiable inputs
        jnp.zeros_like(var),
    )


dense_bn_relu_max.defvjp(_fwd, _bwd)
