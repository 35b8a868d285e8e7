"""Pure-python TFLite (.tflite) model loader for the tensorflow stage.

Closes the "real model load path" gap in the tensorflow filter
analogue (reference plugins/filter_tensorflow/tensorflow.c:87-97
``build_interpreter``: one interpreter per filter instance, loaded
once at init). The container has no tensorflow/tflite-runtime, so
this module reads the .tflite FLATBUFFER directly — the format is
public (flatbuffers binary layout + TFLite ``schema.fbs`` v3) — and
interprets a small-CNN/MLP op subset in numpy:

- FULLY_CONNECTED (builtin 9) with optional bias and fused
  activation (output = x @ W.T + b; TFLite filter layout is
  (out_dim, in_dim), schema.fbs FullyConnectedOptions),
- CONV_2D (3) / DEPTHWISE_CONV_2D (4) NHWC with SAME/VALID padding,
  strides, dilation and fused activation (per-tap accumulation —
  each of the kh×kw kernel taps is one strided-slice matmul),
- MAX_POOL_2D (17) / AVERAGE_POOL_2D (1) (average counts only valid
  cells under SAME padding, matching the TFLite kernel),
- elementwise ADD (0) / SUB (41) / MUL (18) / DIV (42) with numpy
  broadcasting + fused activation, MAXIMUM (55) / MINIMUM (57),
  EXP (47), NEG (59),
- shape ops RESHAPE (22), SQUEEZE (43), CONCATENATION (2), PAD (34),
  MEAN (40) (ReducerOptions keep_dims),
- activations RELU (19), RELU6 (21), LOGISTIC (14), SOFTMAX (25),
  TANH (28); fused NONE/RELU/RELU_N1_TO_1/RELU6/TANH.

Anything else raises ``NotImplementedError`` naming the op so a user
with an LSTM/attention model gets an honest error, not silent
garbage.

Quantized models execute in DEQUANTIZED float: a constant tensor
stored as INT8/UINT8/INT16/INT32 with QuantizationParameters is
materialized at load as ``(q - zero_point) * scale`` float32
(per-tensor, or per-axis along ``quantized_dimension`` when the
scale vector has >1 entry), and the graph then runs in float — the
same float-fallback semantics TFLite's reference interpreter applies
when integer kernels are disabled. Outputs are float32; integer-exact
requantization is out of the pure-python subset. Integer constant
tensors WITHOUT a scale stay integer — they are shape/axis/padding
parameters (RESHAPE/MEAN/PAD), not data.

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
TENSOR_FLOAT16 = 1
TENSOR_INT32 = 2
TENSOR_UINT8 = 3
TENSOR_INT64 = 4
TENSOR_INT16 = 7
TENSOR_INT8 = 9
_NP_OF_TYPE = {TENSOR_FLOAT32: "<f4", TENSOR_FLOAT16: "<f2",
               TENSOR_INT32: "<i4", TENSOR_UINT8: "u1",
               TENSOR_INT64: "<i8", TENSOR_INT16: "<i2",
               TENSOR_INT8: "i1"}

OP_ADD = 0
OP_AVERAGE_POOL_2D = 1
OP_CONCATENATION = 2
OP_CONV_2D = 3
OP_DEPTHWISE_CONV_2D = 4
OP_FULLY_CONNECTED = 9
OP_LOGISTIC = 14
OP_MAX_POOL_2D = 17
OP_MUL = 18
OP_RELU = 19
OP_RELU6 = 21
OP_RESHAPE = 22
OP_SOFTMAX = 25
OP_TANH = 28
OP_PAD = 34
OP_MEAN = 40
OP_SUB = 41
OP_DIV = 42
OP_SQUEEZE = 43
OP_EXP = 47
OP_MAXIMUM = 55
OP_MINIMUM = 57
OP_NEG = 59
ACT_NONE, ACT_RELU, ACT_RELU_N1_TO_1, ACT_RELU6, ACT_TANH = 0, 1, 2, 3, 4
PAD_SAME, PAD_VALID = 0, 1
_OP_NAMES = {0: "ADD", 1: "AVERAGE_POOL_2D", 2: "CONCATENATION",
             3: "CONV_2D", 4: "DEPTHWISE_CONV_2D", 9: "FULLY_CONNECTED",
             14: "LOGISTIC", 16: "LSTM", 17: "MAX_POOL_2D", 18: "MUL",
             19: "RELU", 21: "RELU6", 22: "RESHAPE", 25: "SOFTMAX",
             28: "TANH", 34: "PAD", 39: "TRANSPOSE", 40: "MEAN",
             41: "SUB", 42: "DIV", 43: "SQUEEZE", 45: "STRIDED_SLICE",
             47: "EXP", 49: "SPLIT", 53: "CAST", 55: "MAXIMUM",
             57: "MINIMUM", 59: "NEG"}
_ELEMENTWISE = {OP_ADD: np.add, OP_SUB: np.subtract,
                OP_MUL: np.multiply, OP_DIV: np.divide,
                OP_MAXIMUM: np.maximum, OP_MINIMUM: np.minimum}


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

    def vector_np(self, vec: int, dtype: str) -> np.ndarray:
        if not vec:
            return np.empty(0, dtype=dtype)
        n = self.u32(vec)
        return np.frombuffer(self.d, dtype=dtype, count=n, offset=vec + 4)

    def vector_i32(self, vec: int) -> np.ndarray:
        return self.vector_np(vec, "<i4")

    def vector_bytes(self, vec: int) -> bytes:
        if not vec:
            return b""
        n = self.u32(vec)
        return self.d[vec + 4:vec + 4 + n]

    def string(self, table: int, idx: int) -> str:
        vec = self.indirect(table, idx)
        return self.vector_bytes(vec).decode("utf-8") if vec else ""


def _apply_act(y: np.ndarray, fused: int) -> np.ndarray:
    """schema.fbs ActivationFunctionType applied in place when fused."""
    if fused == ACT_NONE:
        return y
    if fused == ACT_RELU:
        return np.maximum(y, 0)
    if fused == ACT_RELU_N1_TO_1:
        return np.clip(y, -1, 1)
    if fused == ACT_RELU6:
        return np.clip(y, 0, 6)
    if fused == ACT_TANH:
        return np.tanh(y)
    raise NotImplementedError(f"tflite: fused activation enum {fused}")


def _same_pad(in_sz: int, stride: int, eff_k: int) -> tuple[int, int]:
    """TFLite SAME padding: out = ceil(in/stride); split pad, extra
    after (lite/kernels/padding.h ComputePadding semantics — public)."""
    out = -(-in_sz // stride)
    total = max((out - 1) * stride + eff_k - in_sz, 0)
    return total // 2, total - total // 2


def _pad_nhwc(x: np.ndarray, ph: tuple[int, int], pw: tuple[int, int],
              fill: float) -> np.ndarray:
    if ph == (0, 0) and pw == (0, 0):
        return x
    return np.pad(x, ((0, 0), ph, pw, (0, 0)), constant_values=fill)


def _tap_slices(xp: np.ndarray, kh: int, kw: int, sh: int, sw: int,
                dh: int, dw: int, oh: int, ow: int):
    """Yield (ki, kj, slice) — the (n, oh, ow, c) strided view of the
    padded input under kernel tap (ki, kj)."""
    for ki in range(kh):
        for kj in range(kw):
            i0, j0 = ki * dh, kj * dw
            yield ki, kj, xp[:, i0:i0 + (oh - 1) * sh + 1:sh,
                             j0:j0 + (ow - 1) * sw + 1:sw, :]


def _conv_geometry(x, kh, kw, sh, sw, dh, dw, padding, fill):
    h, w = x.shape[1], x.shape[2]
    ekh, ekw = (kh - 1) * dh + 1, (kw - 1) * dw + 1
    if padding == PAD_SAME:
        ph, pw = _same_pad(h, sh, ekh), _same_pad(w, sw, ekw)
        oh, ow = -(-h // sh), -(-w // sw)
    else:
        ph = pw = (0, 0)
        oh, ow = (h - ekh) // sh + 1, (w - ekw) // sw + 1
    return _pad_nhwc(x, ph, pw, fill), oh, ow


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
            # Tensor: shape=0, type=1, buffer=2, name=3, quantization=4
            shape = tuple(fb.vector_i32(fb.indirect(t, 0)).tolist())
            ttype = fb.scalar(t, 1, "<b", 0)
            bufi = fb.scalar(t, 2, "<I", 0)
            name = fb.string(t, 3)
            raw = buffers[bufi] if bufi < len(buffers) else b""
            arr = (self._materialize(fb, t, shape, ttype, name, raw)
                   if raw else None)
            self.tensors.append((shape, ttype, arr, name))
        self.ops = []  # (builtin_code, inputs, outputs, opts dict)
        for t in fb.vector_tables(fb.indirect(sg, 3)):
            # Operator: opcode_index=0, inputs=1, outputs=2,
            # builtin_options_type=3, builtin_options=4 (union)
            code = self.opcodes[fb.scalar(t, 0, "<I", 0)]
            ins = fb.vector_i32(fb.indirect(t, 1)).tolist()
            outs = fb.vector_i32(fb.indirect(t, 2)).tolist()
            self.ops.append((code, ins, outs,
                             self._op_opts(fb, t, code)))

    @staticmethod
    def _materialize(fb: _FB, tensor: int, shape, ttype: int, name: str,
                     raw: bytes) -> np.ndarray:
        """Constant-tensor bytes → numpy. Quantized (has a scale)
        dequantizes to float32; bare INT32/INT64 stays integer (shape/
        axis/padding parameters)."""
        np_t = _NP_OF_TYPE.get(ttype)
        if np_t is None:
            raise NotImplementedError(
                f"tflite tensor {name!r}: type enum {ttype} is outside "
                "the pure-python subset (FLOAT32/FLOAT16/INT8/UINT8/"
                "INT16/INT32/INT64)")
        # QuantizationParameters: min=0, max=1, scale=2 ([f32]),
        # zero_point=3 ([i64]), details=4/5, quantized_dimension=6
        quant = fb.indirect(tensor, 4)
        scale = (fb.vector_np(fb.indirect(quant, 2), "<f4")
                 if quant else np.empty(0, "<f4"))
        if (ttype not in (TENSOR_FLOAT32, TENSOR_FLOAT16,
                          TENSOR_INT32, TENSOR_INT64)
                and scale.size == 0):
            raise NotImplementedError(
                f"tflite tensor {name!r}: only FLOAT32 weights are "
                f"executed without quantization params (type enum "
                f"{ttype} has no scale)")
        q = np.frombuffer(raw, dtype=np_t).reshape(shape)
        if ttype in (TENSOR_FLOAT32, TENSOR_FLOAT16):
            return q.astype(np.float32) if ttype == TENSOR_FLOAT16 else q
        if scale.size == 0:
            return q          # parameter tensor (reshape/axes/paddings)
        zp = fb.vector_np(fb.indirect(quant, 3), "<i8").astype(np.float32)
        if zp.size == 0:
            zp = np.zeros(1, np.float32)
        if scale.size > 1:    # per-axis along quantized_dimension
            qdim = fb.scalar(quant, 6, "<i", 0)
            bshape = [1] * q.ndim
            bshape[qdim] = scale.size
            scale = scale.reshape(bshape)
            zp = (zp.reshape(bshape) if zp.size > 1
                  else np.full(bshape, zp[0], np.float32))
        return (q.astype(np.float32) - zp) * scale

    @staticmethod
    def _op_opts(fb: _FB, t: int, code: int) -> dict:
        """Per-op builtin options (schema.fbs field indices cited
        inline). Missing options table → schema defaults."""
        opt = fb.indirect(t, 4)
        o: dict = {"fused": ACT_NONE}
        if not opt:
            if code in (OP_CONV_2D, OP_DEPTHWISE_CONV_2D,
                        OP_MAX_POOL_2D, OP_AVERAGE_POOL_2D):
                o.update(padding=PAD_SAME, sw=1, sh=1, dw=1, dh=1,
                         fw=1, fh=1, mult=1)
            return o
        if code == OP_FULLY_CONNECTED and fb.scalar(t, 3, "<B", 0) == 8:
            # FullyConnectedOptions: fused_activation_function=0
            o["fused"] = fb.scalar(opt, 0, "<b", ACT_NONE)
        elif code in (OP_ADD, OP_MUL, OP_SUB, OP_DIV):
            # Add/Mul/Sub/DivOptions: fused_activation_function=0
            o["fused"] = fb.scalar(opt, 0, "<b", ACT_NONE)
        elif code == OP_CONCATENATION:
            # ConcatenationOptions: axis=0, fused=1
            o["axis"] = fb.scalar(opt, 0, "<i", 0)
            o["fused"] = fb.scalar(opt, 1, "<b", ACT_NONE)
        elif code in (OP_MAX_POOL_2D, OP_AVERAGE_POOL_2D):
            # Pool2DOptions: padding=0, stride_w=1, stride_h=2,
            # filter_width=3, filter_height=4, fused=5
            o.update(padding=fb.scalar(opt, 0, "<b", PAD_SAME),
                     sw=fb.scalar(opt, 1, "<i", 0) or 1,
                     sh=fb.scalar(opt, 2, "<i", 0) or 1,
                     fw=fb.scalar(opt, 3, "<i", 0) or 1,
                     fh=fb.scalar(opt, 4, "<i", 0) or 1,
                     dw=1, dh=1,
                     fused=fb.scalar(opt, 5, "<b", ACT_NONE))
        elif code == OP_CONV_2D:
            # Conv2DOptions: padding=0, stride_w=1, stride_h=2,
            # fused=3, dilation_w_factor=4, dilation_h_factor=5
            o.update(padding=fb.scalar(opt, 0, "<b", PAD_SAME),
                     sw=fb.scalar(opt, 1, "<i", 0) or 1,
                     sh=fb.scalar(opt, 2, "<i", 0) or 1,
                     fused=fb.scalar(opt, 3, "<b", ACT_NONE),
                     dw=fb.scalar(opt, 4, "<i", 0) or 1,
                     dh=fb.scalar(opt, 5, "<i", 0) or 1)
        elif code == OP_DEPTHWISE_CONV_2D:
            # DepthwiseConv2DOptions: padding=0, stride_w=1,
            # stride_h=2, depth_multiplier=3, fused=4, dilation_w=5,
            # dilation_h=6
            o.update(padding=fb.scalar(opt, 0, "<b", PAD_SAME),
                     sw=fb.scalar(opt, 1, "<i", 0) or 1,
                     sh=fb.scalar(opt, 2, "<i", 0) or 1,
                     mult=fb.scalar(opt, 3, "<i", 0) or 1,
                     fused=fb.scalar(opt, 4, "<b", ACT_NONE),
                     dw=fb.scalar(opt, 5, "<i", 0) or 1,
                     dh=fb.scalar(opt, 6, "<i", 0) or 1)
        elif code == OP_MEAN:
            # ReducerOptions: keep_dims=0
            o["keep_dims"] = bool(fb.scalar(opt, 0, "<b", 0))
        elif code == OP_RESHAPE:
            # ReshapeOptions: new_shape=0 ([i32])
            o["new_shape"] = fb.vector_i32(
                fb.indirect(opt, 0)).tolist()
        elif code == OP_SQUEEZE:
            # SqueezeOptions: squeeze_dims=0 ([i32])
            o["dims"] = fb.vector_i32(fb.indirect(opt, 0)).tolist()
        return o

    @property
    def input_dim(self) -> int:
        shape = self.tensors[self.inputs[0]][0]
        return int(np.prod(shape[1:])) if len(shape) > 1 else int(shape[0])

    @property
    def out_dim(self) -> int:
        shape = self.tensors[self.outputs[0]][0]
        return int(np.prod(shape[1:])) if len(shape) > 1 else int(shape[0])

    def _conv2d(self, x, w, bias, o, depthwise: bool):
        """NHWC conv as kh×kw per-tap strided matmuls. Standard conv
        weights are (out_ch, kh, kw, in_ch); depthwise are
        (1, kh, kw, in_ch*mult) applied channel-wise."""
        kh, kw = w.shape[1], w.shape[2]
        xp, oh, ow = _conv_geometry(x, kh, kw, o["sh"], o["sw"],
                                    o["dh"], o["dw"], o["padding"], 0.0)
        n, in_ch = x.shape[0], x.shape[3]
        if depthwise:
            mult = o["mult"]
            y = np.zeros((n, oh, ow, in_ch * mult), np.float32)
            for ki, kj, sl in _tap_slices(xp, kh, kw, o["sh"], o["sw"],
                                          o["dh"], o["dw"], oh, ow):
                # tap weight (in_ch*mult,) applied to the repeated
                # input channels: out[..., c*mult+m] += x[..., c]*w
                wt = w[0, ki, kj, :].astype(np.float32)
                y += np.repeat(sl, mult, axis=-1) * wt
        else:
            out_ch = w.shape[0]
            y = np.zeros((n, oh, ow, out_ch), np.float32)
            for ki, kj, sl in _tap_slices(xp, kh, kw, o["sh"], o["sw"],
                                          o["dh"], o["dw"], oh, ow):
                y += sl @ w[:, ki, kj, :].T.astype(np.float32)
        if bias is not None:
            y += bias.astype(np.float32)
        return _apply_act(y, o["fused"])

    def _pool2d(self, x, o, is_max: bool):
        fill = -np.inf if is_max else np.nan
        xp, oh, ow = _conv_geometry(x, o["fh"], o["fw"], o["sh"],
                                    o["sw"], 1, 1, o["padding"], fill)
        taps = np.stack([sl for _, _, sl in
                         _tap_slices(xp, o["fh"], o["fw"], o["sh"],
                                     o["sw"], 1, 1, oh, ow)])
        # AVERAGE under SAME padding divides by the VALID cell count
        # only (NaN fill + nanmean), matching the TFLite kernel
        y = (taps.max(axis=0) if is_max
             else np.nanmean(taps, axis=0).astype(x.dtype))
        return _apply_act(y, o["fused"])

    def forward(self, x: np.ndarray) -> np.ndarray:
        """(n, input_dim) → output; numpy executes the op list with
        the leading dim as the runtime batch."""
        in_shape = self.tensors[self.inputs[0]][0]
        if len(in_shape) > 2 and x.ndim == 2:
            x = x.reshape((-1,) + tuple(in_shape[1:]))
        vals: dict[int, np.ndarray] = {self.inputs[0]: x}
        for i, (_, _, arr, _) in enumerate(self.tensors):
            if arr is not None:
                vals[i] = arr
        for code, ins, outs, o in self.ops:
            if code == OP_FULLY_CONNECTED:
                a = vals[ins[0]]
                if a.ndim > 2:    # implicit flatten, batch-major
                    a = a.reshape(a.shape[0], -1)
                w = vals[ins[1]]  # (out_dim, in_dim) — schema layout
                y = a @ w.T.astype(a.dtype)
                if len(ins) > 2 and ins[2] >= 0:
                    y = y + vals[ins[2]].astype(a.dtype)
                y = _apply_act(y, o["fused"])
            elif code in _ELEMENTWISE:
                y = _ELEMENTWISE[code](
                    np.asarray(vals[ins[0]], np.float32),
                    np.asarray(vals[ins[1]], np.float32))
                y = _apply_act(y, o["fused"])
            elif code == OP_CONV_2D:
                bias = (vals[ins[2]] if len(ins) > 2 and ins[2] >= 0
                        else None)
                y = self._conv2d(vals[ins[0]], vals[ins[1]], bias, o,
                                 depthwise=False)
            elif code == OP_DEPTHWISE_CONV_2D:
                bias = (vals[ins[2]] if len(ins) > 2 and ins[2] >= 0
                        else None)
                y = self._conv2d(vals[ins[0]], vals[ins[1]], bias, o,
                                 depthwise=True)
            elif code in (OP_MAX_POOL_2D, OP_AVERAGE_POOL_2D):
                y = self._pool2d(vals[ins[0]], o,
                                 is_max=code == OP_MAX_POOL_2D)
            elif code == OP_RESHAPE:
                a = vals[ins[0]]
                tgt = list(o.get("new_shape") or
                           (vals[ins[1]].tolist() if len(ins) > 1
                            else []))
                if not tgt:
                    raise NotImplementedError(
                        "tflite: RESHAPE without a shape spec")
                # the model's shape is for batch=1; free the leading
                # dim for the runtime batch unless -1 already floats
                if -1 in tgt[1:]:
                    tgt[0] = a.shape[0]
                else:
                    tgt[0] = -1
                y = a.reshape(tgt)
            elif code == OP_SQUEEZE:
                a = vals[ins[0]]
                dims = o.get("dims") or [i for i, s in
                                         enumerate(a.shape)
                                         if s == 1 and i > 0]
                y = a.reshape([s for i, s in enumerate(a.shape)
                               if i not in dims])
            elif code == OP_CONCATENATION:
                y = _apply_act(np.concatenate([vals[i] for i in ins],
                                              axis=o.get("axis", 0)),
                               o["fused"])
            elif code == OP_PAD:
                pads = vals[ins[1]].reshape(-1, 2)
                y = np.pad(vals[ins[0]],
                           [tuple(p) for p in pads.tolist()])
            elif code == OP_MEAN:
                axes = tuple(int(a) for a in np.atleast_1d(vals[ins[1]]))
                y = vals[ins[0]].mean(axis=axes,
                                      keepdims=o.get("keep_dims", False))
            elif code == OP_RELU:
                y = np.maximum(vals[ins[0]], 0)
            elif code == OP_RELU6:
                y = np.clip(vals[ins[0]], 0, 6)
            elif code == OP_LOGISTIC:
                y = 1.0 / (1.0 + np.exp(-vals[ins[0]]))
            elif code == OP_TANH:
                y = np.tanh(vals[ins[0]])
            elif code == OP_EXP:
                y = np.exp(vals[ins[0]])
            elif code == OP_NEG:
                y = -vals[ins[0]]
            elif code == OP_SOFTMAX:
                v = vals[ins[0]]
                e = np.exp(v - v.max(axis=-1, keepdims=True))
                y = e / e.sum(axis=-1, keepdims=True)
            else:
                raise NotImplementedError(
                    "tflite: op "
                    f"{_OP_NAMES.get(code, code)} (builtin {code}) is "
                    "outside the pure-python CNN/MLP subset")
            vals[outs[0]] = y
        out = vals[self.outputs[0]]
        return out.reshape(out.shape[0], -1) if out.ndim > 2 else out


def load_tflite(source) -> TfliteModel:
    """Load a .tflite model from a path or raw bytes."""
    if isinstance(source, (bytes, bytearray)):
        return TfliteModel(bytes(source))
    with open(source, "rb") as f:
        return TfliteModel(f.read())
