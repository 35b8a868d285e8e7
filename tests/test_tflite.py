"""TFLite loader tests.

``_FbWriter`` below is a minimal TEST-ONLY flatbuffer serializer (the
product code only READS .tflite). It follows the public flatbuffers
binary layout: children are emitted after their parents so every
uoffset (child_pos - field_pos) is positive; each table's vtable is
placed immediately before it (soffset = vtable length).
"""

import struct

import numpy as np
import pandas as pd
import pytest

from fluent_bit_ray.stages.tensorflow import FixedMlp, TensorflowStage
from fluent_bit_ray.stages.tflite import (OP_FULLY_CONNECTED, OP_LOGISTIC,
                                          TfliteModel, load_tflite)


class Ref:
    def __init__(self, node):
        self.node = node


class Table:
    """fields: list of (field_idx, kind, value); kind in
    {"u32", "i32", "i8", "ref"}."""

    def __init__(self, fields):
        self.fields = fields


class Vec:
    """kind in {"ref", "i32", "u8", "f32"}."""

    def __init__(self, kind, items):
        self.kind = kind
        self.items = items


class _FbWriter:
    def __init__(self, root: Table, ident: bytes = b"TFL3"):
        self.buf = bytearray()
        self.patches = []  # (pos, node)
        self.queue = [root]
        self.pos_of = {}
        self.buf += struct.pack("<I", 0)  # root placeholder
        self.buf += ident
        self.patches.append((0, root))
        while self.queue:
            self._emit(self.queue.pop(0))
        for pos, node in self.patches:
            struct.pack_into("<I", self.buf, pos,
                             self.pos_of[id(node)] - pos)

    def _align(self, n=4):
        while len(self.buf) % n:
            self.buf += b"\0"

    def _ref(self, node):
        self.patches.append((len(self.buf), node))
        self.buf += struct.pack("<I", 0)
        if id(node) not in self.pos_of and node not in self.queue:
            self.queue.append(node)

    def _emit(self, node):
        self._align()
        if isinstance(node, Table):
            fields = sorted(node.fields)
            n_slots = (fields[-1][0] + 1) if fields else 0
            vt_len = 4 + 2 * n_slots
            # vtable immediately before the table
            vt = bytearray(struct.pack("<HH", vt_len,
                                       4 + 4 * len(fields)))
            slot_off = {}
            off = 4
            for idx, _, _ in fields:
                slot_off[idx] = off
                off += 4
            for i in range(n_slots):
                vt += struct.pack("<H", slot_off.get(i, 0))
            self.buf += vt
            tpos = len(self.buf)
            self.pos_of[id(node)] = tpos
            self.buf += struct.pack("<i", vt_len)  # soffset back to vtable
            for idx, kind, val in fields:
                if kind == "ref":
                    self._ref(val)
                elif kind == "u32":
                    self.buf += struct.pack("<I", val)
                elif kind == "i32":
                    self.buf += struct.pack("<i", val)
                elif kind == "i8":  # byte scalar in a padded 4-byte slot
                    self.buf += struct.pack("<b", val) + b"\0\0\0"
                else:
                    raise AssertionError(kind)
        elif isinstance(node, Vec):
            self.pos_of[id(node)] = len(self.buf)
            self.buf += struct.pack("<I", len(node.items))
            if node.kind == "ref":
                for it in node.items:
                    self._ref(it)
            elif node.kind == "i32":
                self.buf += np.asarray(node.items, "<i4").tobytes()
            elif node.kind == "i64":
                self.buf += np.asarray(node.items, "<i8").tobytes()
            elif node.kind == "f32":
                self.buf += np.asarray(node.items, "<f4").tobytes()
            elif node.kind == "u8":
                self.buf += bytes(node.items)
                self._align()
        else:
            raise AssertionError(type(node))


def _buffer(data: bytes) -> Table:
    return Table([(0, "ref", Vec("u8", data))]) if data else Table([])


def _tensor(shape, buffer_idx, ttype=0, quant=None) -> Table:
    fields = [(0, "ref", Vec("i32", list(shape))),
              (1, "i8", ttype), (2, "u32", buffer_idx)]
    if quant is not None:
        fields.append((4, "ref", quant))
    return Table(fields)


def _quant(scales, zero_points, qdim=0) -> Table:
    """QuantizationParameters: scale=2 [f32], zero_point=3 [i64],
    quantized_dimension=6."""
    return Table([(2, "ref", Vec("f32", list(scales))),
                  (3, "ref", Vec("i64", list(zero_points))),
                  (6, "i32", qdim)])


def build_graph_tflite(tensors, buffers, ops) -> bytes:
    """Generic single-subgraph .tflite: ``tensors`` are Table nodes,
    ``buffers`` raw bytes per buffer index, ``ops`` are
    (builtin_code, inputs, outputs, options_union_type, options_Table).
    Subgraph input = tensor 0, output = last tensor."""
    codes = []
    op_tabs = []
    for code, ins, outs, union_t, opt in ops:
        if code not in codes:
            codes.append(code)
        fields = [(0, "u32", codes.index(code)),
                  (1, "ref", Vec("i32", ins)),
                  (2, "ref", Vec("i32", outs))]
        if opt is not None:
            fields += [(3, "i8", union_t), (4, "ref", opt)]
        op_tabs.append(Table(fields))
    sg = Table([(0, "ref", Vec("ref", tensors)),
                (1, "ref", Vec("i32", [0])),
                (2, "ref", Vec("i32", [len(tensors) - 1])),
                (3, "ref", Vec("ref", op_tabs))])
    model = Table([(0, "u32", 3),
                   (1, "ref", Vec("ref",
                                  [Table([(0, "i8", min(c, 127)),
                                          (3, "i32", c)])
                                   for c in codes])),
                   (2, "ref", Vec("ref", [sg])),
                   (4, "ref", Vec("ref", [_buffer(b) for b in buffers]))])
    return bytes(_FbWriter(model).buf)


def build_mlp_tflite(w1t, b1, w2t, b2, *, fused1=1, fused2=0,
                     ident=b"TFL3", extra_op=None, ttype=0) -> bytes:
    """Two FULLY_CONNECTED layers (weights in TFLite (out,in) layout),
    optional trailing op, as a .tflite flatbuffer."""
    buffers = [_buffer(b""),
               _buffer(np.asarray(w1t, "<f4").tobytes()),
               _buffer(np.asarray(b1, "<f4").tobytes()),
               _buffer(np.asarray(w2t, "<f4").tobytes()),
               _buffer(np.asarray(b2, "<f4").tobytes())]
    in_dim, hid, out = w1t.shape[1], w1t.shape[0], w2t.shape[0]
    tensors = [_tensor((1, in_dim), 0), _tensor(w1t.shape, 1, ttype),
               _tensor((hid,), 2), _tensor((1, hid), 0),
               _tensor(w2t.shape, 3), _tensor((out,), 4),
               _tensor((1, out), 0)]
    fc_opts1 = Table([(0, "i8", fused1)])
    fc_opts2 = Table([(0, "i8", fused2)])
    ops = [Table([(0, "u32", 0), (1, "ref", Vec("i32", [0, 1, 2])),
                  (2, "ref", Vec("i32", [3])), (3, "i8", 8),
                  (4, "ref", fc_opts1)]),
           Table([(0, "u32", 0), (1, "ref", Vec("i32", [3, 4, 5])),
                  (2, "ref", Vec("i32", [6])), (3, "i8", 8),
                  (4, "ref", fc_opts2)])]
    opcodes = [Table([(0, "i8", OP_FULLY_CONNECTED),
                      (3, "i32", OP_FULLY_CONNECTED)])]
    if extra_op is not None:
        tensors.append(_tensor((1, out), 0))
        opcodes.append(Table([(0, "i8", extra_op), (3, "i32", extra_op)]))
        ops.append(Table([(0, "u32", 1), (1, "ref", Vec("i32", [6])),
                          (2, "ref", Vec("i32", [7]))]))
        out_idx = 7
    else:
        out_idx = 6
    sg = Table([(0, "ref", Vec("ref", tensors)),
                (1, "ref", Vec("i32", [0])),
                (2, "ref", Vec("i32", [out_idx])),
                (3, "ref", Vec("ref", ops))])
    model = Table([(0, "u32", 3),
                   (1, "ref", Vec("ref", opcodes)),
                   (2, "ref", Vec("ref", [sg])),
                   (4, "ref", Vec("ref", buffers))])
    return bytes(_FbWriter(model, ident=ident).buf)


def mlp_bytes(mlp: FixedMlp, **kw) -> bytes:
    return build_mlp_tflite(mlp.w1.T, mlp.b1, mlp.w2.T, mlp.b2, **kw)


def test_fb_reader_hand_built_vector():
    """Byte-level flatbuffer assembled by hand from the public spec
    (no shared code with the test writer): root table with a u32
    scalar field 0 and an [int32] vector field 1."""
    from fluent_bit_ray.stages.tflite import _FB
    data = (struct.pack("<I", 16) + b"TFL3"
            # vtable at 8: size 8, table size 12, field offs 4 and 8
            + struct.pack("<4H", 8, 12, 4, 8)
            # table at 16: soffset 8 → vtable at 8
            + struct.pack("<i", 8)
            + struct.pack("<I", 3)          # field 0 = 3
            + struct.pack("<I", 4)          # field 1: uoffset → 28
            + struct.pack("<3i", 2, 7, 9))  # vector [7, 9]
    fb = _FB(data)
    root = fb.root()
    assert root == 16
    assert fb.scalar(root, 0, "<I") == 3
    assert fb.vector_i32(fb.indirect(root, 1)).tolist() == [7, 9]
    assert fb.field(root, 5) == 0  # beyond the vtable → absent


def test_tflite_matches_fixed_mlp():
    """A .tflite of the SAME weights reproduces FixedMlp.forward —
    integer weights keep the float32 path exact."""
    mlp = FixedMlp(6, hidden=5, out_dim=3, seed=7)
    m = load_tflite(mlp_bytes(mlp))
    assert (m.input_dim, m.out_dim) == (6, 3)
    x = np.arange(24, dtype=np.float64).reshape(4, 6) - 10
    np.testing.assert_array_equal(m.forward(x), mlp.forward(x))


def test_tflite_fused_activations_and_softmax():
    mlp = FixedMlp(4, hidden=3, out_dim=2, seed=1)
    m = load_tflite(mlp_bytes(mlp, extra_op=OP_LOGISTIC))
    x = np.ones((2, 4))
    expect = 1.0 / (1.0 + np.exp(-mlp.forward(x)))
    np.testing.assert_allclose(m.forward(x), expect, rtol=1e-6)


def test_tflite_bad_identifier_and_unsupported():
    mlp = FixedMlp(4, hidden=3, out_dim=2)
    with pytest.raises(ValueError, match="TFL3"):
        load_tflite(mlp_bytes(mlp, ident=b"NOPE"))
    with pytest.raises(NotImplementedError, match="LSTM"):
        load_tflite(mlp_bytes(mlp, extra_op=16)).forward(np.ones((1, 4)))
    with pytest.raises(NotImplementedError, match="FLOAT32"):
        load_tflite(mlp_bytes(mlp, ttype=9))  # INT8 weights


def test_tensorflow_stage_model_file(tmp_path, ray_session):
    """model_file end-to-end: the stage loads a real .tflite once per
    actor and scores batches identically to the seeded-MLP path."""
    import ray.data as rd

    mlp = FixedMlp(3, hidden=4, out_dim=2, seed=2024)
    path = tmp_path / "mlp.tflite"
    path.write_bytes(mlp_bytes(mlp))
    df = pd.DataFrame({"rec": [f"r{i}" for i in range(8)],
                       "input": [[i, i + 1, i + 2] for i in range(8)]})
    ds = rd.from_pandas(df)
    seeded = TensorflowStage("input", 3, hidden=4, out_dim=2).apply(ds)
    loaded = TensorflowStage("input", model_file=str(path)).apply(ds)
    a = seeded.to_pandas().sort_values("rec")
    b = loaded.to_pandas().sort_values("rec")
    assert [list(v) for v in a["tf_out"]] == [list(v) for v in b["tf_out"]]


def test_tensorflow_config_model_file(tmp_path):
    """The reference's model_file property (tensorflow.c:446) flows
    through the classic-config builder to the stage spec."""
    from fluent_bit_ray.config import _f_tensorflow

    mlp = FixedMlp(3, hidden=4, out_dim=2)
    path = tmp_path / "m.tflite"
    path.write_bytes(mlp_bytes(mlp))
    spec = _f_tensorflow([("input_field", "input"),
                          ("model_file", str(path))], {})
    assert spec["model_file"] == str(path)
    assert "input_dim" not in spec


def _f32(a) -> bytes:
    return np.asarray(a, "<f4").tobytes()


def test_tflite_quantized_fc_per_tensor():
    """INT8 weights with (scale, zero_point) dequantize at load:
    w = (q - zp) * scale, then the graph runs in float."""
    wq = np.array([[10, -6, 4, 0], [-2, 8, 1, 7]], np.int8)   # (2,4)
    bias = np.array([0.5, -1.0], np.float32)
    m = load_tflite(build_graph_tflite(
        [_tensor((1, 4), 0), _tensor((2, 4), 1, ttype=9,
                                     quant=_quant([0.5], [3])),
         _tensor((2,), 2), _tensor((1, 2), 0)],
        [b"", wq.tobytes(), _f32(bias)],
        [(9, [0, 1, 2], [3], 8, Table([(0, "i8", 0)]))]))
    x = np.array([[1.0, 2.0, 3.0, 4.0]], np.float32)
    w = (wq.astype(np.float32) - 3) * 0.5
    np.testing.assert_allclose(m.forward(x), x @ w.T + bias, rtol=1e-6)


def test_tflite_quantized_fc_per_axis():
    """Per-axis quantization: scale/zero_point vectors broadcast along
    quantized_dimension (dim 0 for FC weights)."""
    wq = np.array([[4, -8], [12, 2]], np.int8)                # (2,2)
    m = load_tflite(build_graph_tflite(
        [_tensor((1, 2), 0), _tensor((2, 2), 1, ttype=9,
                                     quant=_quant([0.5, 0.25],
                                                  [0, 2], qdim=0)),
         _tensor((1, 2), 0)],
        [b"", wq.tobytes()],
        [(9, [0, 1], [2], 8, Table([(0, "i8", 0)]))]))
    x = np.array([[2.0, -1.0]], np.float32)
    w = (wq.astype(np.float32)
         - np.array([[0], [2]])) * np.array([[0.5], [0.25]])
    np.testing.assert_allclose(m.forward(x), x @ w.T, rtol=1e-6)


def test_tflite_conv_pool_reshape_fc_softmax():
    """CNN chain vs an INDEPENDENT naive-loop reference: CONV_2D
    (SAME, stride 1, fused RELU) -> MAX_POOL_2D (2x2 VALID) ->
    RESHAPE -> FULLY_CONNECTED -> SOFTMAX."""
    r = np.random.RandomState(5)
    cw = r.randint(-3, 4, (3, 2, 2, 2)).astype(np.float32)  # (out,kh,kw,in)
    cb = r.randint(-2, 3, 3).astype(np.float32)
    fw = r.randint(-2, 3, (2, 12)).astype(np.float32)
    fbias = r.randint(-1, 2, 2).astype(np.float32)
    m = load_tflite(build_graph_tflite(
        [_tensor((1, 4, 4, 2), 0), _tensor((3, 2, 2, 2), 1),
         _tensor((3,), 2), _tensor((1, 4, 4, 3), 0),
         _tensor((1, 2, 2, 3), 0), _tensor((1, 12), 0),
         _tensor((2, 12), 3), _tensor((2,), 4), _tensor((1, 2), 0),
         _tensor((1, 2), 0)],
        [b"", cw.tobytes(), _f32(cb), fw.tobytes(), _f32(fbias)],
        [(3, [0, 1, 2], [3], 1,          # Conv2DOptions
          Table([(0, "i8", 0), (1, "i32", 1), (2, "i32", 1),
                 (3, "i8", 1), (4, "i32", 1), (5, "i32", 1)])),
         (17, [3], [4], 5,               # Pool2DOptions, VALID 2x2/2
          Table([(0, "i8", 1), (1, "i32", 2), (2, "i32", 2),
                 (3, "i32", 2), (4, "i32", 2), (5, "i8", 0)])),
         (22, [4], [5], 17,              # ReshapeOptions
          Table([(0, "ref", Vec("i32", [1, 12]))])),
         (9, [5, 6, 7], [8], 8, Table([(0, "i8", 0)])),
         (25, [8], [9], 9, None)]))
    x = r.randint(-4, 5, (2, 4, 4, 2)).astype(np.float32)
    # naive reference, loops only
    xp = np.zeros((2, 5, 5, 2), np.float32)
    xp[:, :4, :4, :] = x                 # SAME pad: 0 before, 1 after
    conv = np.zeros((2, 4, 4, 3), np.float32)
    for n in range(2):
        for i in range(4):
            for j in range(4):
                for o in range(3):
                    s = cb[o]
                    for ki in range(2):
                        for kj in range(2):
                            for c in range(2):
                                s += xp[n, i + ki, j + kj, c] * \
                                     cw[o, ki, kj, c]
                    conv[n, i, j, o] = max(s, 0.0)
    pool = np.zeros((2, 2, 2, 3), np.float32)
    for n in range(2):
        for i in range(2):
            for j in range(2):
                for o in range(3):
                    pool[n, i, j, o] = conv[n, 2 * i:2 * i + 2,
                                            2 * j:2 * j + 2, o].max()
    logits = pool.reshape(2, 12) @ fw.T + fbias
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    np.testing.assert_allclose(m.forward(x),
                               e / e.sum(axis=1, keepdims=True),
                               rtol=1e-5)


def test_tflite_depthwise_conv():
    """DEPTHWISE_CONV_2D with depth_multiplier=2, VALID: output
    channel c*mult+k uses input channel c and its own tap weights."""
    r = np.random.RandomState(11)
    w = r.randint(-3, 4, (1, 2, 2, 4)).astype(np.float32)
    m = load_tflite(build_graph_tflite(
        [_tensor((1, 3, 3, 2), 0), _tensor((1, 2, 2, 4), 1),
         _tensor((1, 2, 2, 4), 0)],
        [b"", w.tobytes()],
        [(4, [0, 1], [2], 2,             # DepthwiseConv2DOptions
          Table([(0, "i8", 1), (1, "i32", 1), (2, "i32", 1),
                 (3, "i32", 2), (4, "i8", 0)]))]))
    x = r.randint(-4, 5, (1, 3, 3, 2)).astype(np.float32)
    ref = np.zeros((1, 2, 2, 4), np.float32)
    for i in range(2):
        for j in range(2):
            for c in range(2):
                for k in range(2):
                    o = c * 2 + k
                    ref[0, i, j, o] = sum(
                        x[0, i + ki, j + kj, c] * w[0, ki, kj, o]
                        for ki in range(2) for kj in range(2))
    got = m.forward(x)                   # flattened (1, 16)
    np.testing.assert_allclose(got, ref.reshape(1, 16), rtol=1e-6)


def test_tflite_avg_pool_same_counts_valid_cells():
    """AVERAGE_POOL_2D under SAME padding divides by the number of
    VALID cells in each window (TFLite kernel semantics)."""
    m = load_tflite(build_graph_tflite(
        [_tensor((1, 3, 3, 1), 0), _tensor((1, 2, 2, 1), 0)],
        [b""],
        [(1, [0], [1], 5,
          Table([(0, "i8", 0), (1, "i32", 2), (2, "i32", 2),
                 (3, "i32", 2), (4, "i32", 2), (5, "i8", 0)]))]))
    x = np.arange(1.0, 10.0, dtype=np.float32).reshape(1, 3, 3, 1)
    got = m.forward(x).reshape(2, 2)
    np.testing.assert_allclose(got, [[3.0, 4.5], [7.5, 9.0]])


def test_tflite_elementwise_and_mean():
    """ADD with fused RELU, MUL, and MEAN over spatial axes."""
    add_c = np.array([[-5.0, 0.0, 5.0]], np.float32)
    mul_c = np.array([[2.0, 2.0, 2.0]], np.float32)
    m = load_tflite(build_graph_tflite(
        [_tensor((1, 3), 0), _tensor((1, 3), 1), _tensor((1, 3), 0),
         _tensor((1, 3), 2), _tensor((1, 3), 0)],
        [b"", add_c.tobytes(), mul_c.tobytes()],
        [(0, [0, 1], [2], 11, Table([(0, "i8", 1)])),   # ADD + RELU
         (18, [2, 3], [4], 21, Table([(0, "i8", 0)]))]))  # MUL
    x = np.array([[1.0, 2.0, 3.0]], np.float32)
    np.testing.assert_allclose(m.forward(x), [[0.0, 4.0, 16.0]])

    axes = np.array([1, 2], np.int32)
    m2 = load_tflite(build_graph_tflite(
        [_tensor((1, 2, 2, 3), 0), _tensor((2,), 1, ttype=2),
         _tensor((1, 3), 0)],
        [b"", axes.tobytes()],
        [(40, [0, 1], [2], 27, Table([(0, "i8", 0)]))]))  # MEAN
    x = np.arange(12, dtype=np.float32).reshape(1, 2, 2, 3)
    np.testing.assert_allclose(m2.forward(x), x.mean(axis=(1, 2)))


def test_tflite_conv_pool_property_random_geometry():
    """Hypothesis: CONV_2D and both pools match a naive-loop reference
    across random shapes, strides, and SAME/VALID padding."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(3, 7), st.integers(3, 7),    # h, w
           st.integers(1, 3), st.integers(1, 3),    # in_ch, out_ch
           st.integers(1, 3), st.integers(1, 3),    # kh, kw
           st.integers(1, 2), st.integers(1, 2),    # sh, sw
           st.integers(0, 1),                       # padding SAME/VALID
           st.integers(0, 2 ** 31 - 1))
    def run(h, w, ic, oc, kh, kw, sh, sw, pad, seed):
        from fluent_bit_ray.stages.tflite import (PAD_SAME, TfliteModel,
                                                  _conv_geometry)
        if pad == 1 and (kh > h or kw > w):
            return                                   # no VALID output
        r = np.random.RandomState(seed % (2 ** 31))
        x = r.randint(-3, 4, (2, h, w, ic)).astype(np.float32)
        cw = r.randint(-2, 3, (oc, kh, kw, ic)).astype(np.float32)
        # geometry from the kernel under test
        xp, oh, ow = _conv_geometry(x, kh, kw, sh, sw, 1, 1, pad, 0.0)
        m = load_tflite(build_graph_tflite(
            [_tensor((1, h, w, ic), 0), _tensor((oc, kh, kw, ic), 1),
             _tensor((1, oh, ow, oc), 0)],
            [b"", cw.tobytes()],
            [(3, [0, 1], [2], 1,
              Table([(0, "i8", pad), (1, "i32", sw), (2, "i32", sh),
                     (3, "i8", 0), (4, "i32", 1), (5, "i32", 1)]))]))
        ref = np.zeros((2, oh, ow, oc), np.float32)
        for n in range(2):
            for i in range(oh):
                for j in range(ow):
                    for o in range(oc):
                        ref[n, i, j, o] = sum(
                            xp[n, i * sh + ki, j * sw + kj, c]
                            * cw[o, ki, kj, c]
                            for ki in range(kh) for kj in range(kw)
                            for c in range(ic))
        np.testing.assert_allclose(m.forward(x),
                                   ref.reshape(2, -1), rtol=1e-5)

    run()


def test_tensorflow_stage_cnn_model_file(tmp_path, ray_session):
    """A CONV+POOL+FC .tflite flows through the actor-pool stage: the
    2D (n, input_dim) batch input is reshaped to the model's NHWC
    input and scored per batch."""
    import ray.data as rd

    r = np.random.RandomState(3)
    cw = r.randint(-2, 3, (2, 2, 2, 1)).astype(np.float32)
    fw = r.randint(-2, 3, (2, 8)).astype(np.float32)
    buf = build_graph_tflite(
        [_tensor((1, 4, 4, 1), 0), _tensor((2, 2, 2, 1), 1),
         _tensor((1, 2, 2, 2), 0), _tensor((1, 8), 0),
         _tensor((2, 8), 2), _tensor((1, 2), 0)],
        [b"", cw.tobytes(), fw.tobytes()],
        [(3, [0, 1], [2], 1,
          Table([(0, "i8", 1), (1, "i32", 2), (2, "i32", 2),
                 (3, "i8", 1), (4, "i32", 1), (5, "i32", 1)])),
         (22, [2], [3], 17, Table([(0, "ref", Vec("i32", [1, 8]))])),
         (9, [3, 4], [5], 8, Table([(0, "i8", 0)]))])
    path = tmp_path / "cnn.tflite"
    path.write_bytes(buf)
    m = load_tflite(buf)
    assert m.input_dim == 16 and m.out_dim == 2

    xs = [r.randint(-3, 4, 16).astype(float).tolist() for _ in range(6)]
    df = pd.DataFrame({"rec": [f"r{i}" for i in range(6)], "input": xs})
    out = (TensorflowStage("input", model_file=str(path))
           .apply(rd.from_pandas(df)).to_pandas().sort_values("rec"))
    direct = m.forward(np.asarray(xs, dtype=float))
    got = np.asarray([list(v) for v in out["tf_out"]])
    np.testing.assert_allclose(got, direct, rtol=1e-6)
