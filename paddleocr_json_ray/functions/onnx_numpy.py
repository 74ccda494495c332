"""Dependency-free ONNX model runtime (pure numpy).

The reference's raison d'être is REAL model inference (cpp/src/ocr_det.cpp:
20-78 LoadModel, cpp/src/paddleocr.cpp:23-51); the sandbox ships neither
onnxruntime nor the onnx package, so this module makes the backend seam
(stages/onnx_backend.py) provable with actual serialized ONNX model FILES
instead of mocked sessions.  Two halves:

1. **Protobuf wire codec** specialized to the ONNX ``ModelProto`` subset
   real exporters emit.  The field numbers below are the public
   serialization contract from ``onnx/onnx.proto3`` (ModelProto 1=ir_version
   7=graph 8=opset_import; GraphProto 1=node 5=initializer 11=input
   12=output; NodeProto 1=input 2=output 4=op_type 5=attribute;
   AttributeProto 1=name 20=type 2=f 3=i 4=s 5=t 7=floats 8=ints;
   TensorProto 1=dims 2=data_type 8=name 9=raw_data 4/7=float/int64_data;
   ValueInfoProto 1=name 2=type; TypeProto.Tensor 1=elem_type 2=shape) —
   no proprietary knowledge, just the published .proto.

2. **NumpyOnnxSession** — an onnxruntime-API-compatible evaluator
   (``get_inputs`` / ``get_outputs`` / ``run``) executing the parsed graph
   node-by-node with vectorized numpy kernels.  Valid ONNX graphs are
   topologically sorted by spec, so execution is a single in-order pass.

``stages/onnx_backend._load_session`` falls back to this session class when
onnxruntime is absent, which makes ``backend='onnx'`` actually runnable in
this environment against the tiny real models ``synth/onnx_models.py``
writes (and against any exporter-produced model using the supported op set).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------- protobuf writing

_WIRE_VARINT, _WIRE_I64, _WIRE_LEN, _WIRE_I32 = 0, 1, 2, 5


def _varint(n: int) -> bytes:
    if n < 0:  # protobuf int64: 10-byte two's complement
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_varint(field: int, value: int) -> bytes:
    return _key(field, _WIRE_VARINT) + _varint(value)


def _f_bytes(field: int, value: bytes) -> bytes:
    return _key(field, _WIRE_LEN) + _varint(len(value)) + value


def _f_str(field: int, value: str) -> bytes:
    return _f_bytes(field, value.encode())


def _f_float(field: int, value: float) -> bytes:
    return _key(field, _WIRE_I32) + struct.pack("<f", value)


# numpy dtype <-> TensorProto.DataType (public enum)
_DT_TO_NP = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
             7: np.int64, 9: np.bool_, 11: np.float64}
_NP_TO_DT = {np.dtype(v): k for k, v in _DT_TO_NP.items()}


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    """Serialize a numpy array as a TensorProto (raw_data layout)."""
    arr = np.ascontiguousarray(arr)
    dt = _NP_TO_DT[arr.dtype]
    out = b"".join(_f_varint(1, int(d)) for d in arr.shape)
    out += _f_varint(2, dt)
    out += _f_str(8, name)
    out += _f_bytes(9, arr.tobytes())
    return out


def _attribute(name: str, value) -> bytes:
    out = _f_str(1, name)
    if isinstance(value, bool):
        raise TypeError("use int for ONNX attributes")
    if isinstance(value, int):
        out += _f_varint(3, value) + _f_varint(20, 2)          # INT
    elif isinstance(value, float):
        out += _f_float(2, value) + _f_varint(20, 1)           # FLOAT
    elif isinstance(value, (bytes, str)):
        v = value.encode() if isinstance(value, str) else value
        out += _f_bytes(4, v) + _f_varint(20, 3)               # STRING
    elif isinstance(value, np.ndarray):
        out += _f_bytes(5, tensor_proto("", value)) + _f_varint(20, 4)
    elif isinstance(value, (list, tuple)) and value and isinstance(value[0], float):
        for v in value:
            out += _f_float(7, v)
        out += _f_varint(20, 6)                                # FLOATS
    elif isinstance(value, (list, tuple)):
        for v in value:
            out += _f_varint(8, int(v))
        out += _f_varint(20, 7)                                # INTS
    else:
        raise TypeError(f"unsupported attribute type {type(value)}")
    return out


def node_proto(op_type: str, inputs, outputs, name: str = "", **attrs) -> bytes:
    out = b"".join(_f_str(1, i) for i in inputs)
    out += b"".join(_f_str(2, o) for o in outputs)
    if name:
        out += _f_str(3, name)
    out += _f_str(4, op_type)
    for k, v in attrs.items():
        out += _f_bytes(5, _attribute(k, v))
    return out


def value_info(name: str, elem_type: int, shape) -> bytes:
    """shape entries: int (dim_value) or str (dim_param, symbolic)."""
    dims = b""
    for d in shape:
        dim = _f_str(2, d) if isinstance(d, str) else _f_varint(1, int(d))
        dims += _f_bytes(1, dim)
    tensor_t = _f_varint(1, elem_type) + _f_bytes(2, dims)
    return _f_str(1, name) + _f_bytes(2, _f_bytes(1, tensor_t))


def model_proto(nodes: list[bytes], inputs: list[bytes], outputs: list[bytes],
                initializers: list[bytes], opset: int = 13,
                graph_name: str = "g") -> bytes:
    graph = b"".join(_f_bytes(1, n) for n in nodes)
    graph += _f_str(2, graph_name)
    graph += b"".join(_f_bytes(5, t) for t in initializers)
    graph += b"".join(_f_bytes(11, vi) for vi in inputs)
    graph += b"".join(_f_bytes(12, vi) for vi in outputs)
    out = _f_varint(1, 8)                                # ir_version 8
    out += _f_str(2, "paddleocr_json_ray")               # producer_name
    out += _f_bytes(7, graph)
    out += _f_bytes(8, _f_str(1, "") + _f_varint(2, opset))
    return out


# --------------------------------------------------------- protobuf parsing

def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _fields(buf: bytes):
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == _WIRE_VARINT:
            val, i = _read_varint(buf, i)
        elif wire == _WIRE_LEN:
            ln, i = _read_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wire == _WIRE_I32:
            val = buf[i:i + 4]
            i += 4
        elif wire == _WIRE_I64:
            val = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"bad protobuf wire type {wire}")
        yield field, wire, val


def _packed_ints(wire: int, val) -> list[int]:
    if wire == _WIRE_VARINT:
        return [_signed(val)]
    out, i = [], 0
    while i < len(val):
        v, i = _read_varint(val, i)
        out.append(_signed(v))
    return out


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype = 1
    name = ""
    raw = None
    floats: list[bytes] = []
    int64s: list[int] = []
    for field, wire, val in _fields(buf):
        if field == 1:
            dims.extend(_packed_ints(wire, val))
        elif field == 2:
            dtype = val
        elif field == 4:  # float_data (packed or repeated fixed32)
            floats.append(val if wire == _WIRE_LEN else val)
        elif field == 7:
            int64s.extend(_packed_ints(wire, val))
        elif field == 8:
            name = val.decode()
        elif field == 9:
            raw = val
    np_dt = _DT_TO_NP.get(dtype)
    if np_dt is None:
        raise ValueError(f"unsupported TensorProto data_type {dtype}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dt).reshape(dims).copy()
    elif int64s:
        arr = np.asarray(int64s, dtype=np_dt).reshape(dims)
    elif floats:
        flat = b"".join(floats)
        arr = np.frombuffer(flat, dtype="<f4").astype(np_dt).reshape(dims)
    else:
        arr = np.zeros(dims, dtype=np_dt)
    return name, arr


def _parse_attribute(buf: bytes):
    name = ""
    atype = 0
    f = i = s = t = None
    floats: list[float] = []
    ints: list[int] = []
    for field, wire, val in _fields(buf):
        if field == 1:
            name = val.decode()
        elif field == 20:
            atype = val
        elif field == 2:
            f = struct.unpack("<f", val)[0]
        elif field == 3:
            i = _signed(val)
        elif field == 4:
            s = val
        elif field == 5:
            t = _parse_tensor(val)[1]
        elif field == 7:
            if wire == _WIRE_LEN:
                floats.extend(struct.unpack(f"<{len(val) // 4}f", val))
            else:
                floats.append(struct.unpack("<f", val)[0])
        elif field == 8:
            ints.extend(_packed_ints(wire, val))
    value = {1: f, 2: i, 3: s, 4: t, 6: floats, 7: ints}.get(atype)
    return name, value


def _parse_value_info(buf: bytes):
    name = ""
    elem_type = 0
    shape: list = []
    for field, _w, val in _fields(buf):
        if field == 1:
            name = val.decode()
        elif field == 2:  # TypeProto
            for f2, _w2, v2 in _fields(val):
                if f2 != 1:  # tensor_type
                    continue
                for f3, _w3, v3 in _fields(v2):
                    if f3 == 1:
                        elem_type = v3
                    elif f3 == 2:  # TensorShapeProto
                        for f4, _w4, v4 in _fields(v3):
                            if f4 != 1:
                                continue
                            dim = None
                            for f5, _w5, v5 in _fields(v4):
                                if f5 == 1:
                                    dim = _signed(v5)
                                elif f5 == 2:
                                    dim = v5.decode()
                            shape.append(dim)
    return name, elem_type, shape


class _Node:
    __slots__ = ("op_type", "inputs", "outputs", "attrs", "name")

    def __init__(self, buf: bytes):
        self.inputs: list[str] = []
        self.outputs: list[str] = []
        self.attrs: dict = {}
        self.op_type = ""
        self.name = ""
        for field, _w, val in _fields(buf):
            if field == 1:
                self.inputs.append(val.decode())
            elif field == 2:
                self.outputs.append(val.decode())
            elif field == 3:
                self.name = val.decode()
            elif field == 4:
                self.op_type = val.decode()
            elif field == 5:
                k, v = _parse_attribute(val)
                self.attrs[k] = v


class _Graph:
    def __init__(self, buf: bytes):
        self.nodes: list[_Node] = []
        self.initializers: dict[str, np.ndarray] = {}
        self.inputs: list[tuple[str, int, list]] = []
        self.outputs: list[tuple[str, int, list]] = []
        for field, _w, val in _fields(buf):
            if field == 1:
                self.nodes.append(_Node(val))
            elif field == 5:
                name, arr = _parse_tensor(val)
                self.initializers[name] = arr
            elif field == 11:
                self.inputs.append(_parse_value_info(val))
            elif field == 12:
                self.outputs.append(_parse_value_info(val))


def parse_model(buf: bytes) -> _Graph:
    graph = None
    for field, _w, val in _fields(buf):
        if field == 7:
            graph = _Graph(val)
    if graph is None:
        raise ValueError("no GraphProto in model bytes")
    return graph


# ------------------------------------------------------------- numpy kernels

def _pair(v, default):
    return list(v) if v else list(default)


def _conv(x, w, b, attrs):
    group = attrs.get("group", 1) or 1
    if group != 1:
        raise NotImplementedError("grouped Conv not supported")
    kh, kw = w.shape[2], w.shape[3]
    sy, sx = _pair(attrs.get("strides"), (1, 1))
    dh, dw = _pair(attrs.get("dilations"), (1, 1))
    pt, pl, pb, pr = _pair(attrs.get("pads"), (0, 0, 0, 0))
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    hout = (xp.shape[2] - ((kh - 1) * dh + 1)) // sy + 1
    wout = (xp.shape[3] - ((kw - 1) * dw + 1)) // sx + 1
    out = np.zeros((x.shape[0], w.shape[0], hout, wout), dtype=np.float32)
    for ky in range(kh):
        for kx in range(kw):
            view = xp[:, :, ky * dh:ky * dh + hout * sy:sy,
                      kx * dw:kx * dw + wout * sx:sx]
            out += np.einsum("oc,nchw->nohw", w[:, :, ky, kx], view,
                             dtype=np.float32)
    if b is not None:
        out += b[None, :, None, None]
    return out.astype(np.float32)


def _avgpool(x, attrs):
    kh, kw = attrs["kernel_shape"]
    sy, sx = _pair(attrs.get("strides"), (kh, kw))
    pt, pl, pb, pr = _pair(attrs.get("pads"), (0, 0, 0, 0))
    if (pt, pl, pb, pr) != (0, 0, 0, 0):
        raise NotImplementedError("padded AveragePool not supported")
    hout = (x.shape[2] - kh) // sy + 1
    wout = (x.shape[3] - kw) // sx + 1
    out = np.zeros((x.shape[0], x.shape[1], hout, wout), dtype=np.float32)
    for ky in range(kh):
        for kx in range(kw):
            out += x[:, :, ky:ky + hout * sy:sy, kx:kx + wout * sx:sx]
    return (out / (kh * kw)).astype(np.float32)


def _gemm(a, b, c, attrs):
    if attrs.get("transA", 0):
        a = a.T
    if attrs.get("transB", 0):
        b = b.T
    out = attrs.get("alpha", 1.0) or 1.0
    out = (out * (a @ b)).astype(np.float32)
    if c is not None:
        out = out + np.float32(attrs.get("beta", 1.0) or 1.0) * c
    return out.astype(np.float32)


def _softmax(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return (e / np.sum(e, axis=axis, keepdims=True)).astype(np.float32)


# ------------------------------------------------------------------ session

class _IOInfo:
    def __init__(self, name, elem_type, shape):
        self.name = name
        self.type = f"tensor({np.dtype(_DT_TO_NP.get(elem_type, np.float32)).name})"
        self.shape = shape


class NumpyOnnxSession:
    """onnxruntime-compatible session over the numpy evaluator.

    Accepts a path to a serialized .onnx file or raw model bytes.  Executes
    nodes in file order (the ONNX spec requires graphs be topologically
    sorted).  Supported ops: Conv, Relu, Sigmoid, Tanh, Clip, Add, Sub,
    Mul, Div, MatMul, Gemm, Softmax, GlobalAveragePool, AveragePool,
    MaxPool, Reshape, Transpose, Concat, Flatten, Squeeze, Unsqueeze,
    Identity, Constant, ReduceMean.
    """

    def __init__(self, model: str | bytes):
        if isinstance(model, (bytes, bytearray)):
            buf = bytes(model)
        else:
            with open(model, "rb") as f:
                buf = f.read()
        self.graph = parse_model(buf)
        init = self.graph.initializers
        self._inputs = [_IOInfo(n, t, s) for n, t, s in self.graph.inputs
                        if n not in init]
        self._outputs = [_IOInfo(n, t, s) for n, t, s in self.graph.outputs]

    def get_inputs(self):
        return self._inputs

    def get_outputs(self):
        return self._outputs

    def run(self, output_names, feeds: dict):
        env: dict[str, np.ndarray] = dict(self.graph.initializers)
        env.update(feeds)
        for nd in self.graph.nodes:
            args = [env[i] if i else None for i in nd.inputs]
            env[nd.outputs[0]] = self._exec(nd, args)
        names = output_names or [o.name for o in self._outputs]
        return [env[n] for n in names]

    def _exec(self, nd: _Node, args):
        op = nd.op_type
        a = nd.attrs
        x = args[0] if args else None
        if op == "Conv":
            return _conv(x, args[1], args[2] if len(args) > 2 else None, a)
        if op == "Relu":
            return np.maximum(x, 0)
        if op == "Sigmoid":
            return (1.0 / (1.0 + np.exp(-x))).astype(np.float32)
        if op == "Tanh":
            return np.tanh(x).astype(np.float32)
        if op == "Clip":
            lo = args[1] if len(args) > 1 and args[1] is not None else a.get("min")
            hi = args[2] if len(args) > 2 and args[2] is not None else a.get("max")
            return np.clip(x, lo, hi)
        if op == "Add":
            return x + args[1]
        if op == "Sub":
            return x - args[1]
        if op == "Mul":
            return x * args[1]
        if op == "Div":
            return x / args[1]
        if op == "MatMul":
            return (x @ args[1]).astype(np.float32)
        if op == "Gemm":
            return _gemm(x, args[1], args[2] if len(args) > 2 else None, a)
        if op == "Softmax":
            return _softmax(x, a.get("axis", -1))
        if op == "GlobalAveragePool":
            return x.mean(axis=(2, 3), keepdims=True).astype(np.float32)
        if op == "AveragePool":
            return _avgpool(x, a)
        if op == "MaxPool":
            kh, kw = a["kernel_shape"]
            sy, sx = _pair(a.get("strides"), (kh, kw))
            hout = (x.shape[2] - kh) // sy + 1
            wout = (x.shape[3] - kw) // sx + 1
            out = np.full((x.shape[0], x.shape[1], hout, wout), -np.inf,
                          dtype=np.float32)
            for ky in range(kh):
                for kx in range(kw):
                    np.maximum(out, x[:, :, ky:ky + hout * sy:sy,
                                      kx:kx + wout * sx:sx], out=out)
            return out
        if op == "Reshape":
            return x.reshape([int(d) for d in args[1]])
        if op == "Transpose":
            return np.transpose(x, a.get("perm"))
        if op == "Concat":
            return np.concatenate(args, axis=a["axis"])
        if op == "Flatten":
            ax = a.get("axis", 1)
            if ax is None:
                ax = 1
            lead = int(np.prod(x.shape[:ax])) if ax else 1
            return x.reshape(lead, -1)
        if op == "Squeeze":
            axes = a.get("axes") or (
                [int(v) for v in args[1]] if len(args) > 1 else None)
            return np.squeeze(x, axis=tuple(axes) if axes else None)
        if op == "Unsqueeze":
            axes = a.get("axes") or [int(v) for v in args[1]]
            for ax in sorted(axes):
                x = np.expand_dims(x, ax)
            return x
        if op == "Round":  # round-half-to-even per ONNX spec
            return np.rint(x).astype(np.float32)
        if op == "Identity":
            return x
        if op == "Constant":
            return a["value"]
        if op == "ReduceMean":
            axes = tuple(a.get("axes") or range(x.ndim))
            return x.mean(axis=axes,
                          keepdims=bool(a.get("keepdims", 1))).astype(np.float32)
        raise NotImplementedError(f"ONNX op not supported: {op}")
