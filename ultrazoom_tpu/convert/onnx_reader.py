"""Minimal pure-Python ONNX ModelProto reader for structural validation.

The build image has no ``onnx`` package, but torch's TorchScript ONNX
exporter serializes the ModelProto in C++ — so this repo CAN produce real
.onnx artifacts (tools/export_onnx.py) yet has nothing to inspect them
with.  This module decodes just enough of the (stable, public) onnx.proto
wire format to gate an export structurally: IR/opset versions, graph
input/output names and dim metadata, node op_types, and initializer
names/shapes/byte-counts.

This is a protobuf *wire* decoder (varints + length-delimited fields), not
a vendored onnx; field numbers follow the public onnx.proto3 schema
(github.com/onnx/onnx/blob/main/onnx/onnx.proto).  It is read-only and
ignores every field it does not need.
"""

from __future__ import annotations

import dataclasses
import struct

__all__ = ["OnnxModelSummary", "read_onnx", "summarize_onnx"]


def _decode_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = buf[i]
        result |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return result, i
        shift += 7


def _walk(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's fields.

    value is an int for varint/fixed fields and a bytes slice for
    length-delimited fields (submessages, strings, packed repeats).
    """
    i = 0
    n = len(buf)
    while i < n:
        key, i = _decode_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            val, i = _decode_varint(buf, i)
        elif wire == 1:  # 64-bit
            val = struct.unpack_from("<q", buf, i)[0]
            i += 8
        elif wire == 2:  # length-delimited
            ln, i = _decode_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wire == 5:  # 32-bit
            val = struct.unpack_from("<i", buf, i)[0]
            i += 4
        else:  # pragma: no cover - groups are absent from onnx
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _packed_varints(val) -> list[int]:
    if isinstance(val, int):
        return [val]
    out, i = [], 0
    while i < len(val):
        v, i = _decode_varint(val, i)
        out.append(v)
    return out


def _tensor_summary(buf: bytes) -> dict:
    # TensorProto: dims=1, data_type=2, float_data=4, int64_data=7,
    # name=8, raw_data=9.
    dims: list[int] = []
    out = {"name": "", "data_type": 0, "nbytes": 0}
    for field, _, val in _walk(buf):
        if field == 1:
            dims.extend(_packed_varints(val))
        elif field == 2:
            out["data_type"] = val
        elif field == 8:
            out["name"] = val.decode()
        elif field == 9:
            out["nbytes"] = len(val)
        elif field in (4, 5, 7):  # non-raw data encodings
            out["nbytes"] += len(val) if isinstance(val, bytes) else 8
    out["dims"] = tuple(dims)
    return out


def _value_info(buf: bytes) -> dict:
    # ValueInfoProto: name=1, type=2 (TypeProto: tensor_type=1;
    # Tensor: elem_type=1, shape=2 (dim=1: dim_value=1 | dim_param=2)).
    out = {"name": "", "elem_type": 0, "shape": ()}
    for field, _, val in _walk(buf):
        if field == 1:
            out["name"] = val.decode()
        elif field == 2:
            for f2, _, v2 in _walk(val):
                if f2 != 1:  # tensor_type only
                    continue
                for f3, _, v3 in _walk(v2):
                    if f3 == 1:
                        out["elem_type"] = v3
                    elif f3 == 2:
                        dims = []
                        for f4, _, v4 in _walk(v3):
                            if f4 != 1:
                                continue
                            d = None
                            for f5, _, v5 in _walk(v4):
                                if f5 == 1:
                                    d = v5
                                elif f5 == 2:
                                    d = v5.decode()  # symbolic dim
                            dims.append(d)
                        out["shape"] = tuple(dims)
    return out


def _node(buf: bytes) -> dict:
    # NodeProto: input=1, output=2, name=3, op_type=4, attribute=5.
    out = {
        "inputs": [], "outputs": [], "op_type": "", "name": "",
        "attr_tensors": [],
    }
    for field, _, val in _walk(buf):
        if field == 1:
            out["inputs"].append(val.decode())
        elif field == 2:
            out["outputs"].append(val.decode())
        elif field == 3:
            out["name"] = val.decode()
        elif field == 4:
            out["op_type"] = val.decode()
        elif field == 5:
            # AttributeProto: t=5 (single TensorProto), tensors=10 — weights
            # the exporter constant-folded into Constant nodes live here.
            for f2, _, v2 in _walk(val):
                if f2 in (5, 10):
                    out["attr_tensors"].append(_tensor_summary(v2))
    return out


@dataclasses.dataclass
class OnnxModelSummary:
    ir_version: int
    producer: str
    opset: dict[str, int]  # domain -> version ("" = default ONNX domain)
    graph_name: str
    inputs: list[dict]
    outputs: list[dict]
    ops: list[str]  # op_type per node, graph order
    initializers: list[dict]  # name/dims/data_type/nbytes
    constant_tensors: list[dict]  # tensors folded into node attributes

    @property
    def op_counts(self) -> dict[str, int]:
        counts: dict[str, int] = {}
        for op in self.ops:
            counts[op] = counts.get(op, 0) + 1
        return counts

    @property
    def initializer_nbytes(self) -> int:
        return sum(t["nbytes"] for t in self.initializers)

    @property
    def weight_elements(self) -> int:
        """Total elements across initializers and constant-folded tensors."""
        total = 0
        for t in self.initializers + self.constant_tensors:
            n = 1
            for d in t["dims"]:
                n *= d
            total += n
        return total


def read_onnx(path) -> OnnxModelSummary:
    with open(path, "rb") as f:
        return summarize_onnx(f.read())


def summarize_onnx(model_bytes: bytes) -> OnnxModelSummary:
    # ModelProto: ir_version=1, producer_name=2, graph=7, opset_import=8
    # (OperatorSetIdProto: domain=1, version=2).
    ir_version, producer, opset = 0, "", {}
    graph = b""
    for field, _, val in _walk(model_bytes):
        if field == 1:
            ir_version = val
        elif field == 2:
            producer = val.decode()
        elif field == 7:
            graph = val
        elif field == 8:
            dom, ver = "", 0
            for f2, _, v2 in _walk(val):
                if f2 == 1:
                    dom = v2.decode()
                elif f2 == 2:
                    ver = v2
            opset[dom] = ver
    if not graph:
        raise ValueError("not an ONNX ModelProto: no graph field")

    name, inputs, outputs, ops, inits, consts = "", [], [], [], [], []
    init_names = set()
    for field, _, val in _walk(graph):
        # GraphProto: node=1, name=2, initializer=5, input=11, output=12.
        if field == 1:
            node = _node(val)
            ops.append(node["op_type"])
            consts.extend(node["attr_tensors"])
        elif field == 2:
            name = val.decode()
        elif field == 5:
            t = _tensor_summary(val)
            inits.append(t)
            init_names.add(t["name"])
        elif field == 11:
            inputs.append(_value_info(val))
        elif field == 12:
            outputs.append(_value_info(val))
    # Graph inputs include initializers in some exporters; keep true inputs.
    inputs = [v for v in inputs if v["name"] not in init_names]
    return OnnxModelSummary(
        ir_version, producer, opset, name, inputs, outputs, ops, inits, consts
    )
