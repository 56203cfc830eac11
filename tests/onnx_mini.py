"""Minimal, independent ONNX reader + numpy executor used to validate the
dependency-free exporter (alphazero_tpu/compat/onnx_export.py).

This is a from-scratch protobuf wire-format parser over the same stable
subset of onnx.proto3 the exporter emits, plus a numpy interpreter for the
ops appearing in the exported graphs.  Nothing is shared with the emitter
beyond field numbers from the public ONNX schema, so a roundtrip
(emit -> parse -> execute == JAX forward) genuinely validates the bytes."""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------- wire parse
def _read_varint(buf, i):
    n = shift = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def parse_message(buf: bytes):
    """Returns {field_number: [raw values]} — varints as int, len-delimited
    as bytes, 32-bit as bytes(4)."""
    fields = {}
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"wire type {wire}")
        fields.setdefault(field, []).append(v)
    return fields


def _packed_varints(b: bytes):
    out, i = [], 0
    while i < len(b):
        v, i = _read_varint(b, i)
        out.append(v)
    return out


_ONNX2NP = {1: np.float32, 7: np.int64, 9: np.bool_}


def _parse_tensor(b: bytes):
    f = parse_message(b)
    dims = _packed_varints(f[1][0]) if 1 in f else []
    dtype = _ONNX2NP[f[2][0]]
    name = f[8][0].decode()
    arr = np.frombuffer(f[9][0], dtype=dtype).reshape(dims)
    return name, arr


def _parse_attr(b: bytes):
    f = parse_message(b)
    name = f[1][0].decode()
    atype = f[20][0]
    if atype == 1:                               # FLOAT
        return name, struct.unpack("<f", f[2][0])[0]
    if atype == 2:                               # INT
        return name, _signed(f[3][0])
    if atype == 7:                               # INTS
        return name, [_signed(v) for v in _packed_varints(f[8][0])]
    raise ValueError(f"attr type {atype}")


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_node(b: bytes):
    f = parse_message(b)
    return {
        "inputs": [s.decode() for s in f.get(1, [])],
        "outputs": [s.decode() for s in f.get(2, [])],
        "op": f[4][0].decode(),
        "attrs": dict(_parse_attr(a) for a in f.get(5, [])),
    }


def load_model(path: str):
    with open(path, "rb") as fh:
        model = parse_message(fh.read())
    graph = parse_message(model[7][0])
    opset = parse_message(model[8][0])
    nodes = [_parse_node(n) for n in graph.get(1, [])]
    inits = dict(_parse_tensor(t) for t in graph.get(5, []))
    def io_names(field):
        return [parse_message(v)[1][0].decode() for v in graph.get(field, [])]
    return {
        "ir_version": model[1][0],
        "opset": opset.get(2, [0])[0],
        "nodes": nodes,
        "initializers": inits,
        "inputs": io_names(11),
        "outputs": io_names(12),
    }


# ----------------------------------------------------------------- execution
def _reshape(x, shape):
    out = [x.shape[i] if s == 0 else s for i, s in enumerate(shape)]
    return x.reshape(out)          # numpy handles the single -1


def _log_softmax(x, axis):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return (x - m) - np.log(e.sum(axis=axis, keepdims=True))


def run_model(model, feeds: dict):
    env = dict(model["initializers"])
    env.update(feeds)
    for n in model["nodes"]:
        i = [env[name] for name in n["inputs"]]
        a = n["attrs"]
        op = n["op"]
        if op == "Transpose":
            out = np.transpose(i[0], a["perm"])
        elif op == "MatMul":
            out = i[0] @ i[1]
        elif op == "Add":
            out = i[0] + i[1]
        elif op == "Relu":
            out = np.maximum(i[0], 0)
        elif op == "Tanh":
            out = np.tanh(i[0])
        elif op == "Where":
            out = np.where(i[0][..., None] if i[0].ndim < i[1].ndim
                           else i[0], i[1], i[2])
        elif op == "Concat":
            out = np.concatenate(i, axis=a["axis"])
        elif op == "Reshape":
            out = _reshape(i[0], list(i[1]))
        elif op == "Slice":
            x, starts, ends, axes = i
            sl = [slice(None)] * x.ndim
            for s, e, ax in zip(starts, ends, axes):
                sl[ax] = slice(int(s), None if e >= (1 << 30) else int(e))
            out = x[tuple(sl)]
        elif op in ("ReduceMax", "ReduceMean"):
            fn = np.max if op == "ReduceMax" else np.mean
            out = fn(i[0], axis=tuple(a["axes"]),
                     keepdims=bool(a.get("keepdims", 1)))
        elif op == "BatchNormalization":
            x, scale, bias, mean, var = i
            shp = [1] * x.ndim
            shp[1] = -1
            out = ((x - mean.reshape(shp))
                   / np.sqrt(var.reshape(shp) + a.get("epsilon", 1e-5))
                   * scale.reshape(shp) + bias.reshape(shp))
        elif op == "LogSoftmax":
            out = _log_softmax(i[0], a.get("axis", -1))
        else:
            raise NotImplementedError(op)
        env[n["outputs"][0]] = out
    return [env[name] for name in model["outputs"]]
