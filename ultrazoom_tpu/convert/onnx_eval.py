"""Pure-numpy ONNX graph evaluator for the deployment parity gate.

The reference's deployment chain ends in an ONNX Runtime numeric check
(export_model.ipynb cell-11: ``assert_allclose(rtol=1e-2, atol=1e-3)``),
but this image has no ``onnxruntime``.  This module EXECUTES the exported
ModelProto with numpy — same wire-format reader as
``convert/onnx_reader.py``, extended to full graph semantics — so the
shipped .onnx artifacts are numerically validated in-env rather than
only structurally gated.  It is a reference evaluator, not a runtime:
clarity and spec fidelity over speed (gate inputs are small).

Supported op set = everything the TorchScript exporter emits for the
MewZoom families (Conv, Gemm, Resize-cubic, DepthToSpace, Slice,
Gather/Shape plumbing, pointwise) plus a few close relatives; unknown
ops raise with the node name so gaps surface loudly.

Spec references: onnx/docs/Operators.md (opset 17 semantics).
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from ultrazoom_tpu.convert.onnx_reader import (
    _decode_varint,
    _packed_varints,
    _walk,
)

__all__ = ["OnnxGraph", "load_onnx_graph", "run_onnx"]

# TensorProto.DataType -> numpy dtype (the subset exporters emit).
# bfloat16 (16) decodes via its uint16 bit pattern widened to float32 —
# numpy has no native bfloat16 (see _tensor_value).
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 5: np.int16, 6: np.int32,
    7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}
_BFLOAT16 = 16
# Typed (non-raw) storage keeps sub-32-bit floats as BIT PATTERNS in
# int32_data (onnx.proto: "float16/bfloat16 values must be bit-wise
# converted to an uint16_t prior to writing"), so a value cast would turn
# the bits 15360 (fp16 1.0) into the float 15360.0.
_BITCAST_FROM_UINT16 = {10, _BFLOAT16}


def _signed(v: int, bits: int = 64) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


def _tensor_value(buf: bytes) -> np.ndarray:
    """Decode a TensorProto into a numpy array (raw or typed storage)."""
    dims: list[int] = []
    dtype = 1
    raw = None
    floats: list[float] = []
    ints: list[int] = []
    doubles: list[float] = []
    for field, wire, val in _walk(buf):
        if field == 1:
            dims.extend(_packed_varints(val))
        elif field == 2:
            dtype = val
        elif field == 4:  # float_data (packed fixed32 or repeated)
            if isinstance(val, bytes):
                floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
            else:
                floats.append(struct.unpack("<f", struct.pack("<i", val))[0])
        elif field == 5:  # int32_data (also holds bool/int8/16/fp16)
            ints.extend(_signed(v, 32) for v in _packed_varints(val))
        elif field == 7:  # int64_data
            ints.extend(_signed(v) for v in _packed_varints(val))
        elif field == 10:  # double_data
            if isinstance(val, bytes):
                doubles.extend(struct.unpack(f"<{len(val) // 8}d", val))
            else:
                doubles.append(struct.unpack("<d", struct.pack("<q", val))[0])
        elif field == 9:  # raw_data
            raw = val
    if dtype == _BFLOAT16:
        # No numpy bfloat16: widen the uint16 bit pattern into float32
        # (bf16 is the top half of an f32).
        if raw is not None:
            bits = np.frombuffer(raw, np.uint16)
        else:
            bits = np.asarray(ints, np.uint16)
        arr = (bits.astype(np.uint32) << 16).view(np.float32)
        return arr.reshape(dims)
    np_dtype = _DTYPES[dtype]
    if raw is not None:
        arr = np.frombuffer(raw, np_dtype)
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif doubles:
        arr = np.asarray(doubles, np.float64)
    elif ints:
        if dtype in _BITCAST_FROM_UINT16:
            arr = np.asarray(ints, np.uint16).view(np_dtype)  # fp16 bits
        else:
            arr = np.asarray(ints).astype(np_dtype)
    else:
        arr = np.zeros(0, np_dtype)
    return arr.reshape(dims).astype(np_dtype, copy=False)


def _attributes(buf_list: list[bytes]) -> dict:
    """Decode NodeProto.attribute list -> {name: python value}."""
    out: dict = {}
    for buf in buf_list:
        name = ""
        value = None
        ints: list[int] = []
        floats: list[float] = []
        strings: list[str] = []
        for field, wire, val in _walk(buf):
            if field == 1:
                name = val.decode()
            elif field == 2:  # f (fixed32)
                value = struct.unpack("<f", struct.pack("<i", val))[0]
            elif field == 3:  # i
                value = _signed(val)
            elif field == 4:  # s
                value = val.decode()
            elif field == 5:  # t
                value = _tensor_value(val)
            elif field == 7:  # floats
                if isinstance(val, bytes):
                    floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
                else:
                    floats.append(struct.unpack("<f", struct.pack("<i", val))[0])
            elif field == 8:  # ints
                ints.extend(_signed(v) for v in _packed_varints(val))
            elif field == 9:  # strings
                strings.append(val.decode())
        if value is None:
            value = ints or floats or strings or None
        out[name] = value
    return out


@dataclasses.dataclass
class _Node:
    op_type: str
    name: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict


@dataclasses.dataclass
class OnnxGraph:
    nodes: list[_Node]
    initializers: dict  # name -> np.ndarray
    input_names: list[str]
    output_names: list[str]


def load_onnx_graph(path) -> OnnxGraph:
    with open(path, "rb") as f:
        model_bytes = f.read()
    graph = b""
    for field, _, val in _walk(model_bytes):
        if field == 7:  # ModelProto.graph
            graph = val
    if not graph:
        raise ValueError("not an ONNX ModelProto: no graph field")

    nodes: list[_Node] = []
    inits: dict = {}
    inputs: list[str] = []
    outputs: list[str] = []
    for field, _, val in _walk(graph):
        if field == 1:  # node
            n_in: list[str] = []
            n_out: list[str] = []
            op = name = ""
            attr_bufs: list[bytes] = []
            for f2, _, v2 in _walk(val):
                if f2 == 1:
                    n_in.append(v2.decode())
                elif f2 == 2:
                    n_out.append(v2.decode())
                elif f2 == 3:
                    name = v2.decode()
                elif f2 == 4:
                    op = v2.decode()
                elif f2 == 5:
                    attr_bufs.append(v2)
            nodes.append(_Node(op, name, n_in, n_out, _attributes(attr_bufs)))
        elif field == 5:  # initializer
            t = _tensor_value(val)
            # re-read just the name (cheap second pass over this tensor)
            for f2, _, v2 in _walk(val):
                if f2 == 8:
                    inits[v2.decode()] = t
        elif field == 11:
            for f2, _, v2 in _walk(val):
                if f2 == 1:
                    inputs.append(v2.decode())
        elif field == 12:
            for f2, _, v2 in _walk(val):
                if f2 == 1:
                    outputs.append(v2.decode())
    inputs = [n for n in inputs if n not in inits]
    return OnnxGraph(nodes, inits, inputs, outputs)


# ---------------------------------------------------------------------------
# op kernels


def _conv(x, w, b, attrs):
    group = attrs.get("group", 1) or 1
    kh, kw = w.shape[2], w.shape[3]
    sh, sw = attrs.get("strides") or [1, 1]
    dh, dw = attrs.get("dilations") or [1, 1]
    pads = attrs.get("pads") or [0, 0, 0, 0]
    pt, pl, pb, pr = pads
    n, c, h, wd = x.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    ho = (h + pt + pb - (dh * (kh - 1) + 1)) // sh + 1
    wo = (wd + pl + pr - (dw * (kw - 1) + 1)) // sw + 1
    m = w.shape[0]
    cg = c // group
    mg = m // group
    # patches via strided view: (N, C, kh, kw, Ho, Wo)
    s = xp.strides
    patches = np.lib.stride_tricks.as_strided(
        xp,
        shape=(n, c, kh, kw, ho, wo),
        strides=(s[0], s[1], s[2] * dh, s[3] * dw, s[2] * sh, s[3] * sw),
        writeable=False,
    )
    out = np.empty((n, m, ho, wo), np.float32)
    for g in range(group):
        pg = patches[:, g * cg : (g + 1) * cg]  # (N,Cg,kh,kw,Ho,Wo)
        wg = w[g * mg : (g + 1) * mg]  # (Mg,Cg,kh,kw)
        out[:, g * mg : (g + 1) * mg] = np.einsum(
            "nckhw,mck->nmhw",
            pg.reshape(n, cg, kh * kw, ho, wo),
            wg.reshape(mg, cg, kh * kw),
            optimize=True,
        )
    if b is not None:
        out += b.reshape(1, -1, 1, 1)
    return out.astype(np.float32)


def _cubic_weights(t: np.ndarray, a: float) -> np.ndarray:
    """Keys kernel weights for the 4 taps around fractional offset t."""
    # tap distances: 1+t, t, 1-t, 2-t
    d = np.stack([1.0 + t, t, 1.0 - t, 2.0 - t])
    ad = np.abs(d)
    w_near = (a + 2.0) * ad**3 - (a + 3.0) * ad**2 + 1.0  # |d| <= 1
    w_far = a * ad**3 - 5.0 * a * ad**2 + 8.0 * a * ad - 4.0 * a  # 1<|d|<2
    return np.where(ad <= 1.0, w_near, w_far)


def _resize_axis(x, axis, out_size, scale, a, coord_mode):
    in_size = x.shape[axis]
    dst = np.arange(out_size, dtype=np.float64)
    if coord_mode in ("half_pixel", "pytorch_half_pixel"):
        src = (dst + 0.5) / scale - 0.5
        if coord_mode == "pytorch_half_pixel" and out_size <= 1:
            src = np.zeros_like(dst)
    elif coord_mode == "asymmetric":
        src = dst / scale
    elif coord_mode == "align_corners":
        src = dst * (in_size - 1) / max(out_size - 1, 1)
    else:
        raise NotImplementedError(f"Resize coord mode {coord_mode!r}")
    base = np.floor(src).astype(np.int64)
    t = (src - base).astype(np.float32)
    weights = _cubic_weights(t, a).astype(np.float32)  # (4, out)
    idx = np.clip(
        base[None, :] + np.arange(-1, 3)[:, None], 0, in_size - 1
    )  # (4, out) — border replication, matching torch's clamped access
    moved = np.moveaxis(x, axis, -1)
    gathered = moved[..., idx]  # (..., 4, out)
    out = np.einsum("...ko,ko->...o", gathered, weights)
    return np.moveaxis(out, -1, axis).astype(np.float32)


def _resize(x, scales, sizes, attrs):
    mode = attrs.get("mode", "nearest")
    if mode != "cubic":
        raise NotImplementedError(f"Resize mode {mode!r}")
    a = attrs.get("cubic_coeff_a", -0.75)
    coord = attrs.get("coordinate_transformation_mode", "half_pixel")
    if sizes is not None and sizes.size:
        out_sizes = [int(v) for v in sizes]
        scales = [o / i for o, i in zip(out_sizes, x.shape)]
    else:
        scales = [float(s) for s in scales]
        out_sizes = [int(np.floor(i * s)) for i, s in zip(x.shape, scales)]
    out = x
    for axis, (osz, sc) in enumerate(zip(out_sizes, scales)):
        if osz != x.shape[axis] or sc != 1.0:
            out = _resize_axis(out, axis, osz, sc, a, coord)
    return out


def _depth_to_space(x, attrs):
    b = attrs["blocksize"]
    mode = attrs.get("mode", "DCR")
    n, c, h, w = x.shape
    co = c // (b * b)
    if mode == "CRD":  # torch PixelShuffle order
        y = x.reshape(n, co, b, b, h, w).transpose(0, 1, 4, 2, 5, 3)
    else:  # DCR
        y = x.reshape(n, b, b, co, h, w).transpose(0, 3, 4, 1, 5, 2)
    return y.reshape(n, co, h * b, w * b)


def _slice(data, starts, ends, axes, steps):
    starts = [int(v) for v in starts]
    ends = [int(v) for v in ends]
    axes = (
        [int(v) for v in axes] if axes is not None else list(range(len(starts)))
    )
    steps = [int(v) for v in steps] if steps is not None else [1] * len(starts)
    sl = [slice(None)] * data.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = ax % data.ndim
        sl[ax] = slice(st, en, sp)
    return data[tuple(sl)]


def _gemm(a, b, c, attrs):
    alpha = attrs.get("alpha", 1.0)
    beta = attrs.get("beta", 1.0)
    if attrs.get("transA", 0):
        a = a.T
    if attrs.get("transB", 0):
        b = b.T
    y = alpha * (a @ b)
    if c is not None:
        y = y + beta * c
    return y.astype(np.float32)


def _int_aware_div(a, b):
    if np.issubdtype(np.asarray(a).dtype, np.integer) and np.issubdtype(
        np.asarray(b).dtype, np.integer
    ):
        # ONNX integer Div truncates toward zero (C semantics); numpy //
        # floors, which differs on mixed-sign operands (-7 // 2 == -4 but
        # ORT yields -3).
        a, b = np.asarray(a), np.asarray(b)
        return np.trunc(a / b).astype(a.dtype)
    return np.asarray(a) / np.asarray(b)


def run_onnx(graph: OnnxGraph, feeds: dict) -> list[np.ndarray]:
    """Execute the graph on ``feeds`` (name -> ndarray); returns outputs."""
    env: dict = dict(graph.initializers)
    for k, v in feeds.items():
        env[k] = np.asarray(v)

    def get(name):
        return env[name] if name else None

    for node in graph.nodes:
        op = node.op_type
        x = [get(n) for n in node.inputs]
        at = node.attrs
        if op == "Constant":
            y = at.get("value")
            if y is None:  # value_float / value_int / value_ints variants
                for k in ("value_float", "value_int", "value_ints", "value_floats"):
                    if k in at:
                        y = np.asarray(at[k])
                        break
        elif op == "Shape":
            y = np.asarray(x[0].shape, np.int64)
        elif op == "Gather":
            y = np.take(x[0], x[1].astype(np.int64), axis=at.get("axis", 0) or 0)
        elif op == "Add":
            y = x[0] + x[1]
        elif op == "Sub":
            y = x[0] - x[1]
        elif op == "Mul":
            y = x[0] * x[1]
        elif op == "Div":
            y = _int_aware_div(x[0], x[1])
        elif op == "Pow":
            y = x[0] ** x[1]
        elif op == "Sqrt":
            y = np.sqrt(x[0])
        elif op == "Neg":
            y = -x[0]
        elif op == "Exp":
            y = np.exp(x[0])
        elif op == "Sigmoid":
            # Branch on sign so exp() only ever sees non-positive inputs
            # (exp(-x) overflows f32 for x < -88 and warns).
            v = x[0].astype(np.float32)
            e = np.exp(-np.abs(v))
            y = np.where(v >= 0, 1.0 / (1.0 + e), e / (1.0 + e))
        elif op == "Relu":
            y = np.maximum(x[0], 0)
        elif op == "Tanh":
            y = np.tanh(x[0])
        elif op == "Clip":
            lo = x[1] if len(x) > 1 and x[1] is not None else -np.inf
            hi = x[2] if len(x) > 2 and x[2] is not None else np.inf
            y = np.clip(x[0], lo, hi)
        elif op == "Concat":
            y = np.concatenate([v for v in x], axis=at.get("axis", 0) or 0)
        elif op == "Unsqueeze":
            axes = x[1] if len(x) > 1 else np.asarray(at.get("axes", []))
            y = x[0]
            for ax in sorted(int(v) for v in np.atleast_1d(axes)):
                y = np.expand_dims(y, ax)
        elif op == "Squeeze":
            axes = x[1] if len(x) > 1 else np.asarray(at.get("axes", []))
            axes = tuple(int(v) for v in np.atleast_1d(axes))
            # No axes given means "drop every unit dim" per the ONNX spec
            # (np.squeeze(x, ()) would squeeze nothing).
            y = np.squeeze(x[0], axes or None)
        elif op == "Reshape":
            y = x[0].reshape([int(v) for v in x[1]])
        elif op == "Transpose":
            y = np.transpose(x[0], at.get("perm") or None)
        elif op == "Flatten":
            ax = at.get("axis", 1)
            if ax is None:
                ax = 1
            y = x[0].reshape(int(np.prod(x[0].shape[:ax] or (1,))), -1)
        elif op == "Cast":
            y = x[0].astype(_DTYPES[at["to"]])
        elif op == "Slice":
            y = _slice(
                x[0], x[1], x[2],
                x[3] if len(x) > 3 else None,
                x[4] if len(x) > 4 else None,
            )
        elif op == "Gemm":
            y = _gemm(x[0], x[1], x[2] if len(x) > 2 else None, at)
        elif op == "MatMul":
            y = (x[0] @ x[1]).astype(np.float32)
        elif op == "Conv":
            y = _conv(x[0], x[1], x[2] if len(x) > 2 else None, at)
        elif op == "Resize":
            scales = x[2] if len(x) > 2 else None
            sizes = x[3] if len(x) > 3 else None
            y = _resize(x[0], scales, sizes, at)
        elif op == "DepthToSpace":
            y = _depth_to_space(x[0], at)
        elif op == "GlobalAveragePool":
            y = x[0].mean(axis=(2, 3), keepdims=True).astype(np.float32)
        elif op == "ReduceMean":
            axes = at.get("axes")
            if axes is None and len(x) > 1 and x[1] is not None:
                axes = [int(v) for v in x[1]]
            y = x[0].mean(
                axis=tuple(axes) if axes else None,
                keepdims=bool(at.get("keepdims", 1)),
            ).astype(np.float32)
        elif op == "Expand":
            y = np.broadcast_to(x[0], np.broadcast_shapes(
                x[0].shape, tuple(int(v) for v in x[1])
            ))
        elif op == "Identity":
            y = x[0]
        else:
            raise NotImplementedError(
                f"ONNX op {op!r} (node {node.name!r}) not implemented in the "
                "numpy evaluator — extend convert/onnx_eval.py"
            )
        outs = y if isinstance(y, (list, tuple)) else [y]
        for name, val in zip(node.outputs, outs):
            env[name] = val
    return [env[n] for n in graph.output_names]
