"""Pure-python TFLite (.tflite) model loader for the tensorflow stage.

Closes the "real model load path" gap in the tensorflow filter
analogue (reference plugins/filter_tensorflow/tensorflow.c:87-97
``build_interpreter``: one interpreter per filter instance, loaded
once at init). The container has no tensorflow/tflite-runtime, so
this module reads the .tflite FLATBUFFER directly — the format is
public (flatbuffers binary layout + TFLite ``schema.fbs`` v3) — and
interprets the small-MLP op subset in numpy:

- FULLY_CONNECTED (builtin 9) with optional bias and fused
  NONE/RELU/RELU6 activation (output = x @ W.T + b; TFLite filter
  layout is (out_dim, in_dim), schema.fbs FullyConnectedOptions),
- RELU (19), RELU6 (21), LOGISTIC (14), SOFTMAX (25), TANH (28).

Anything else raises ``NotImplementedError`` naming the op so a user
with a conv/LSTM model gets an honest error, not silent garbage.
Only FLOAT32 tensors are executed (quantized models raise).

Flatbuffer reading (no dependency): a buffer is
``[u32 root-uoffset]["TFL3" identifier]...``; a table starts with an
i32 soffset to its vtable (vtable = table_pos - soffset); the vtable
is ``[u16 vtable_size][u16 table_size][u16 field_offset...]`` where
field_offset is from the table start (0 = field absent); strings and
vectors/tables are reached via u32 uoffsets RELATIVE TO THE FIELD
POSITION; vectors are ``[u32 len][elements]``.
"""

from __future__ import annotations

import struct

import numpy as np

# TFLite schema.fbs enum values (public)
TENSOR_FLOAT32 = 0
OP_FULLY_CONNECTED = 9
OP_LOGISTIC = 14
OP_RELU = 19
OP_RELU6 = 21
OP_SOFTMAX = 25
OP_TANH = 28
ACT_NONE, ACT_RELU, ACT_RELU_N1_TO_1, ACT_RELU6 = 0, 1, 2, 3
_OP_NAMES = {0: "ADD", 1: "AVERAGE_POOL_2D", 2: "CONCATENATION",
             3: "CONV_2D", 4: "DEPTHWISE_CONV_2D", 9: "FULLY_CONNECTED",
             14: "LOGISTIC", 16: "LSTM", 18: "MUL", 19: "RELU",
             21: "RELU6", 22: "RESHAPE", 25: "SOFTMAX", 28: "TANH"}


class _FB:
    """Minimal flatbuffers reader: tables, vtables, vectors, strings."""

    def __init__(self, data: bytes):
        self.d = data

    def u16(self, p):
        return struct.unpack_from("<H", self.d, p)[0]

    def u32(self, p):
        return struct.unpack_from("<I", self.d, p)[0]

    def i32(self, p):
        return struct.unpack_from("<i", self.d, p)[0]

    def root(self) -> int:
        return self.u32(0)

    def field(self, table: int, idx: int) -> int:
        """Absolute position of field ``idx`` in ``table``, or 0 if
        absent (vtable slot missing or zero)."""
        vt = table - self.i32(table)
        vt_size = self.u16(vt)
        slot = 4 + 2 * idx
        if slot >= vt_size:
            return 0
        off = self.u16(vt + slot)
        return table + off if off else 0

    def scalar(self, table: int, idx: int, fmt: str, default=0):
        p = self.field(table, idx)
        return struct.unpack_from(fmt, self.d, p)[0] if p else default

    def indirect(self, table: int, idx: int) -> int:
        """Follow a uoffset field to its target (table/vector/string)."""
        p = self.field(table, idx)
        return p + self.u32(p) if p else 0

    def vector_len(self, vec: int) -> int:
        return self.u32(vec) if vec else 0

    def vector_tables(self, vec: int) -> list[int]:
        """[uoffset] vector → absolute positions of the target tables."""
        if not vec:
            return []
        n = self.u32(vec)
        return [vec + 4 + 4 * i + self.u32(vec + 4 + 4 * i)
                for i in range(n)]

    def vector_i32(self, vec: int) -> np.ndarray:
        if not vec:
            return np.empty(0, dtype=np.int32)
        n = self.u32(vec)
        return np.frombuffer(self.d, dtype="<i4", count=n, offset=vec + 4)

    def vector_bytes(self, vec: int) -> bytes:
        if not vec:
            return b""
        n = self.u32(vec)
        return self.d[vec + 4:vec + 4 + n]

    def string(self, table: int, idx: int) -> str:
        vec = self.indirect(table, idx)
        return self.vector_bytes(vec).decode("utf-8") if vec else ""


class TfliteModel:
    """Parsed .tflite: the primary subgraph's tensors + operator list,
    weights materialized as numpy arrays (model held once per ACTOR —
    the interpreter-per-instance contract)."""

    def __init__(self, data: bytes):
        if len(data) < 8:
            raise ValueError("not a tflite flatbuffer (too short)")
        if data[4:8] != b"TFL3":
            raise ValueError(
                f"not a TFLite v3 flatbuffer (identifier {data[4:8]!r},"
                " expected b'TFL3')")
        fb = _FB(data)
        model = fb.root()
        self.version = fb.scalar(model, 0, "<I", 0)
        # Model: operator_codes=1, subgraphs=2, description=3, buffers=4
        opcode_tabs = fb.vector_tables(fb.indirect(model, 1))
        self.opcodes = []
        for t in opcode_tabs:
            # OperatorCode: deprecated_builtin_code (int8, field 0) for
            # codes <=127, builtin_code (int32, field 3) on newer
            # exporters — take whichever is set (schema.fbs note)
            dep = fb.scalar(t, 0, "<b", 0)
            full = fb.scalar(t, 3, "<i", 0)
            self.opcodes.append(max(dep, full))
        buf_tabs = fb.vector_tables(fb.indirect(model, 4))
        buffers = [fb.vector_bytes(fb.indirect(t, 0)) for t in buf_tabs]

        subgraphs = fb.vector_tables(fb.indirect(model, 2))
        if not subgraphs:
            raise ValueError("tflite: no subgraphs")
        sg = subgraphs[0]
        # SubGraph: tensors=0, inputs=1, outputs=2, operators=3, name=4
        self.inputs = fb.vector_i32(fb.indirect(sg, 1)).tolist()
        self.outputs = fb.vector_i32(fb.indirect(sg, 2)).tolist()
        self.tensors = []  # (shape tuple, type, np.ndarray|None, name)
        for t in fb.vector_tables(fb.indirect(sg, 0)):
            # Tensor: shape=0, type=1, buffer=2, name=3
            shape = tuple(fb.vector_i32(fb.indirect(t, 0)).tolist())
            ttype = fb.scalar(t, 1, "<b", 0)
            bufi = fb.scalar(t, 2, "<I", 0)
            name = fb.string(t, 3)
            arr = None
            raw = buffers[bufi] if bufi < len(buffers) else b""
            if raw:
                if ttype != TENSOR_FLOAT32:
                    raise NotImplementedError(
                        f"tflite tensor {name!r}: only FLOAT32 weights "
                        f"are executed (type enum {ttype}; quantized "
                        "models are out of the pure-python subset)")
                arr = np.frombuffer(raw, dtype="<f4").reshape(shape)
            self.tensors.append((shape, ttype, arr, name))
        self.ops = []  # (builtin_code, inputs, outputs, fused_act)
        for t in fb.vector_tables(fb.indirect(sg, 3)):
            # Operator: opcode_index=0, inputs=1, outputs=2,
            # builtin_options_type=3, builtin_options=4 (union)
            code = self.opcodes[fb.scalar(t, 0, "<I", 0)]
            ins = fb.vector_i32(fb.indirect(t, 1)).tolist()
            outs = fb.vector_i32(fb.indirect(t, 2)).tolist()
            fused = ACT_NONE
            # BuiltinOptions union member FullyConnectedOptions == 8
            if code == OP_FULLY_CONNECTED and \
                    fb.scalar(t, 3, "<B", 0) == 8:
                opt = fb.indirect(t, 4)
                if opt:
                    fused = fb.scalar(opt, 0, "<b", ACT_NONE)
            self.ops.append((code, ins, outs, fused))

    @property
    def input_dim(self) -> int:
        shape = self.tensors[self.inputs[0]][0]
        return int(np.prod(shape[1:])) if len(shape) > 1 else int(shape[0])

    @property
    def out_dim(self) -> int:
        shape = self.tensors[self.outputs[0]][0]
        return int(np.prod(shape[1:])) if len(shape) > 1 else int(shape[0])

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(n, input_dim) → (n, out_dim); numpy executes the op list."""
        vals: dict[int, np.ndarray] = {self.inputs[0]: x}
        for i, (_, _, arr, _) in enumerate(self.tensors):
            if arr is not None:
                vals[i] = arr
        for code, ins, outs, fused in self.ops:
            if code == OP_FULLY_CONNECTED:
                a = vals[ins[0]]
                w = vals[ins[1]]  # (out_dim, in_dim) — schema layout
                y = a @ w.T.astype(a.dtype)
                if len(ins) > 2 and ins[2] >= 0:
                    y = y + vals[ins[2]].astype(a.dtype)
                if fused == ACT_RELU:
                    np.maximum(y, 0, out=y)
                elif fused == ACT_RELU6:
                    np.clip(y, 0, 6, out=y)
                elif fused != ACT_NONE:
                    raise NotImplementedError(
                        f"tflite: fused activation enum {fused}")
            elif code == OP_RELU:
                y = np.maximum(vals[ins[0]], 0)
            elif code == OP_RELU6:
                y = np.clip(vals[ins[0]], 0, 6)
            elif code == OP_LOGISTIC:
                y = 1.0 / (1.0 + np.exp(-vals[ins[0]]))
            elif code == OP_TANH:
                y = np.tanh(vals[ins[0]])
            elif code == OP_SOFTMAX:
                v = vals[ins[0]]
                e = np.exp(v - v.max(axis=-1, keepdims=True))
                y = e / e.sum(axis=-1, keepdims=True)
            else:
                raise NotImplementedError(
                    "tflite: op "
                    f"{_OP_NAMES.get(code, code)} (builtin {code}) is "
                    "outside the pure-python MLP subset "
                    "(FULLY_CONNECTED/RELU/RELU6/LOGISTIC/SOFTMAX/TANH)")
            vals[outs[0]] = y
        return vals[self.outputs[0]]


def load_tflite(source) -> TfliteModel:
    """Load a .tflite model from a path or raw bytes."""
    if isinstance(source, (bytes, bytearray)):
        return TfliteModel(bytes(source))
    with open(source, "rb") as f:
        return TfliteModel(f.read())
