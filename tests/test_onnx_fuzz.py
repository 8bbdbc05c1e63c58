"""Fuzz the bundled ONNX interpreter against JAX on randomized one-op graphs.

The round-3 verdict's residual ONNX risk: writer and interpreter live in the
same module, so a SEMANTIC convention bug shared by the graph builder and
``run_onnx`` is invisible to test_onnx_native.py (and no onnxruntime exists
in-image to arbitrate). tests/test_onnx_wire.py closes the wire-format half
with Google's protobuf parser; this suite closes the op-semantics half by
building randomized single-op graphs with the writer's own primitives and
comparing ``run_onnx`` against the corresponding JAX op — an implementation
that shares nothing with the numpy interpreter. The ops and attribute
corners exercised are exactly the opset-13 behaviors the three model
families' graphs rely on (negative axes, broadcast ranks, TopK largest/tie
order, axes-as-input vs axes-as-attribute, ArgMax keepdims, Slice clamping).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloudprocessing_tpu.export.onnx_native import (
    _attr_i,
    _attr_ints,
    graph_proto,
    model_proto,
    node_proto,
    parse_model,
    run_onnx,
    tensor_proto,
    value_info,
)


def _run_single_op(op_type, feeds, attrs=(), initializers=(), n_out=1,
                   extra_inputs=()):
    """Build a one-node model with the writer primitives and execute it
    through the full parse_model -> run_onnx path."""
    in_names = list(feeds) + list(extra_inputs)
    out_names = [f"out{i}" for i in range(n_out)]
    node = node_proto(op_type, in_names, out_names, "n0", attrs=list(attrs))
    graph = graph_proto(
        nodes=[node],
        name="fuzz",
        initializers=[tensor_proto(n, a) for n, a in initializers],
        inputs=[value_info(n, feeds[n].shape) for n in feeds],
        outputs=[value_info(n, ()) for n in out_names],
    )
    parsed = parse_model(model_proto(graph))
    got = run_onnx(parsed, dict(feeds))
    return [got[n] for n in out_names]


def _f(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


@pytest.fixture(params=range(3))
def op_rng(request):
    return np.random.default_rng(100 + request.param)


def _close(got, want, **kw):
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-6, atol=1e-6, **kw)


def test_matmul_ranks(op_rng):
    for sa, sb in (((4, 5), (5, 3)), ((2, 4, 5), (2, 5, 3)),
                   ((2, 3, 4, 5), (2, 3, 5, 6)), ((2, 4, 5), (5, 3))):
        a, b = _f(op_rng, *sa), _f(op_rng, *sb)
        (got,) = _run_single_op("MatMul", {"a": a, "b": b})
        _close(got, jnp.matmul(a, b), err_msg=f"{sa}x{sb}")


def test_elementwise_broadcast(op_rng):
    cases = (((3, 4), (3, 4)), ((3, 4), (4,)), ((2, 1, 4), (3, 1)),
             ((5,), ()))
    for op, jop in (("Add", jnp.add), ("Sub", jnp.subtract),
                    ("Mul", jnp.multiply), ("Div", jnp.divide),
                    ("Max", jnp.maximum), ("Min", jnp.minimum)):
        for sa, sb in cases:
            a, b = _f(op_rng, *sa), _f(op_rng, *sb) + 2.0  # Div: no zeros
            (got,) = _run_single_op(op, {"a": a, "b": b})
            _close(got, jop(a, b), err_msg=f"{op} {sa}x{sb}")


def test_unary(op_rng):
    x = _f(op_rng, 3, 5)
    (got,) = _run_single_op("Relu", {"x": x})
    _close(got, jax.nn.relu(x))
    (got,) = _run_single_op("Sqrt", {"x": np.abs(x)})
    _close(got, jnp.sqrt(np.abs(x)))


def test_softmax_axes(op_rng):
    x = _f(op_rng, 2, 7, 5) * 4.0
    for axis in (-1, 1, 2):
        (got,) = _run_single_op("Softmax", {"x": x}, attrs=[_attr_i("axis", axis)])
        _close(got, jax.nn.softmax(x, axis=axis), err_msg=f"axis={axis}")


def test_reduce_attr_axes(op_rng):
    x = _f(op_rng, 2, 6, 5)
    for axes in ((1,), (-1,), (1, 2), (0, -1)):
        for keep in (0, 1):
            attrs = [_attr_ints("axes", axes), _attr_i("keepdims", keep)]
            (got,) = _run_single_op("ReduceMean", {"x": x}, attrs=attrs)
            _close(got, jnp.mean(x, axis=axes, keepdims=bool(keep)),
                   err_msg=f"mean axes={axes} keep={keep}")
            (got,) = _run_single_op("ReduceMax", {"x": x}, attrs=attrs)
            _close(got, jnp.max(x, axis=axes, keepdims=bool(keep)),
                   err_msg=f"max axes={axes} keep={keep}")


def test_reducesum_input_axes(op_rng):
    """Opset 13: ReduceSum takes axes as a SECOND INPUT (int64 tensor)."""
    x = _f(op_rng, 3, 4, 5)
    for axes in ((0,), (2,), (1, 2)):
        (got,) = _run_single_op(
            "ReduceSum", {"x": x}, attrs=[_attr_i("keepdims", 1)],
            initializers=[("ax", np.asarray(axes, np.int64))],
            extra_inputs=["ax"],
        )
        _close(got, jnp.sum(x, axis=axes, keepdims=True), err_msg=f"{axes}")


def test_unsqueeze_input_axes(op_rng):
    x = _f(op_rng, 3, 4)
    for axes in ((0,), (2,), (0, 3)):
        (got,) = _run_single_op(
            "Unsqueeze", {"x": x},
            initializers=[("ax", np.asarray(axes, np.int64))],
            extra_inputs=["ax"],
        )
        want = jnp.expand_dims(x, axes)
        _close(got, want, err_msg=f"{axes}")


def test_transpose_concat_reshape(op_rng):
    x = _f(op_rng, 2, 3, 4)
    for perm in ((0, 2, 1), (2, 0, 1), (1, 2, 0)):
        (got,) = _run_single_op("Transpose", {"x": x},
                                attrs=[_attr_ints("perm", perm)])
        _close(got, jnp.transpose(x, perm), err_msg=f"{perm}")
    a, b = _f(op_rng, 2, 3, 4), _f(op_rng, 2, 5, 4)
    (got,) = _run_single_op("Concat", {"a": a, "b": b},
                            attrs=[_attr_i("axis", 1)])
    _close(got, jnp.concatenate([a, b], axis=1))
    (got,) = _run_single_op(
        "Reshape", {"x": x},
        initializers=[("s", np.asarray([-1, 4], np.int64))],
        extra_inputs=["s"],
    )
    _close(got, jnp.reshape(x, (-1, 4)))


def test_topk_largest_smallest_and_ties(op_rng):
    x = _f(op_rng, 3, 16)
    # inject ties: jax.lax.top_k resolves equal values to the LOWER index,
    # the convention the exported kNN graphs rely on
    x[:, 5] = x[:, 2]
    k = np.asarray([4], np.int64)
    vals, idx = _run_single_op(
        "TopK", {"x": x}, attrs=[_attr_i("axis", -1), _attr_i("largest", 1)],
        initializers=[("k", k)], extra_inputs=["k"], n_out=2,
    )
    wv, wi = jax.lax.top_k(x, 4)
    _close(vals, wv)
    np.testing.assert_array_equal(idx, np.asarray(wi))
    vals, idx = _run_single_op(
        "TopK", {"x": x}, attrs=[_attr_i("axis", -1), _attr_i("largest", 0)],
        initializers=[("k", k)], extra_inputs=["k"], n_out=2,
    )
    wv, wi = jax.lax.top_k(-x, 4)
    _close(vals, -np.asarray(wv))
    np.testing.assert_array_equal(idx, np.asarray(wi))


def test_gathernd_batched_rows(op_rng):
    data = _f(op_rng, 3, 10, 6)
    idx = op_rng.integers(0, 10, (3, 4, 5, 1)).astype(np.int64)
    (got,) = _run_single_op("GatherND", {"d": data, "i": idx},
                            attrs=[_attr_i("batch_dims", 1)])
    want = jnp.take_along_axis(
        jnp.asarray(data), jnp.asarray(idx).reshape(3, -1)[..., None], axis=1
    ).reshape(3, 4, 5, 6)
    _close(got, want)


def test_where_lessorequal_argmax(op_rng):
    a, b = _f(op_rng, 4, 5), _f(op_rng, 4, 5)
    (mask,) = _run_single_op("LessOrEqual", {"a": a, "b": b})
    np.testing.assert_array_equal(mask, np.asarray(jnp.asarray(a) <= b))
    (got,) = _run_single_op("Where", {"c": mask, "a": a, "b": b})
    _close(got, jnp.where(mask, a, b))
    for keep in (0, 1):
        (got,) = _run_single_op(
            "ArgMax", {"x": a},
            attrs=[_attr_i("axis", 1), _attr_i("keepdims", keep)],
        )
        want = jnp.argmax(a, axis=1, keepdims=bool(keep))
        np.testing.assert_array_equal(got, np.asarray(want))


def test_slice_negative_and_clamped_ends(op_rng):
    x = _f(op_rng, 4, 10, 6)
    cases = (
        ([1], [3], [0]),          # plain
        ([0], [-1], [1]),         # negative end
        ([2], [1 << 30], [1]),    # end beyond extent clamps (INT_MAX idiom)
        ([0, 1], [2, 4], [0, 2]),  # two axes
    )
    for starts, ends, axes in cases:
        (got,) = _run_single_op(
            "Slice", {"x": x},
            initializers=[("s", np.asarray(starts, np.int64)),
                          ("e", np.asarray(ends, np.int64)),
                          ("a", np.asarray(axes, np.int64))],
            extra_inputs=["s", "e", "a"],
        )
        sl = [slice(None)] * 3
        for s, e, a in zip(starts, ends, axes):
            sl[a] = slice(s, min(e, x.shape[a]) if e > 0 else e)
        _close(got, jnp.asarray(x)[tuple(sl)], err_msg=f"{starts}{ends}{axes}")


def test_expand_gather_shape_identity(op_rng):
    x = _f(op_rng, 3, 1, 5)
    (got,) = _run_single_op(
        "Expand", {"x": x},
        initializers=[("s", np.asarray([3, 4, 5], np.int64))],
        extra_inputs=["s"],
    )
    _close(got, jnp.broadcast_to(x, (3, 4, 5)))
    (got,) = _run_single_op("Shape", {"x": x})
    np.testing.assert_array_equal(got, np.asarray([3, 1, 5], np.int64))
    data = _f(op_rng, 7, 4)
    idx = op_rng.integers(0, 7, (3,)).astype(np.int64)
    (got,) = _run_single_op("Gather", {"d": data, "i": idx},
                            attrs=[_attr_i("axis", 0)])
    _close(got, jnp.take(jnp.asarray(data), jnp.asarray(idx), axis=0))
    (got,) = _run_single_op("Identity", {"x": x})
    _close(got, x)
