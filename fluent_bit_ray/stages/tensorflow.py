"""Tensorflow-filter analogue: model scoring as an actor-pool stage.

Reference semantics (plugins/filter_tensorflow/tensorflow.c):

- one interpreter per filter INSTANCE, loaded once at init
  (tensorflow.c:87-97 ``build_interpreter``) → here: the model weights
  are materialized once per ACTOR in ``__init__`` and reused for every
  batch (the map_batches actor-pool pattern);
- ``input_field`` names the record field holding an unrolled numeric
  array that must match the model's input size (tensorflow.c:289-301);
  records without the field / wrong size / non-numeric are DROPPED
  (the reference only packs a record after successful inference,
  :371-406);
- ``normalization_value`` divides every input element (:314-326);
- the output record carries the original fields when
  ``include_input_fields`` (default true, :198-204), plus
  ``inference_time`` (:392-395) and ``tf_out`` = the model's output
  array (:397-406).

The container has no tensorflow/tflite, so the default "model" is a
DETERMINISTIC pure-numpy MLP with integer weights derived from a
seed (``FixedMlp``). Integer weights + integer-quantized inputs keep
every accumulation exact in float64, which is what lets the
``tf_score`` oracle reproduce the full forward pass in DuckDB SQL
bit-for-bit.

A REAL ``model_file`` (the reference's property, tensorflow.c:151,
:446) is also supported: ``stages/tflite.py`` parses the .tflite
flatbuffer directly (pure python, public schema.fbs) and executes the
FULLY_CONNECTED/RELU/LOGISTIC/SOFTMAX/TANH subset in numpy — the
loaded model is built once per ACTOR in ``__init__``, exactly like
the seeded one.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd

from .base import Stage, register


class FixedMlp:
    """Seed-deterministic 2-layer integer MLP:
    ``out = relu(x @ W1 + b1) @ W2 + b2``.

    Weights are small ints in [-3, 3] from a fixed RandomState, so the
    whole forward pass is exact integer arithmetic (representable in
    float64 and in DuckDB BIGINT for the oracle)."""

    def __init__(self, input_dim: int, hidden: int = 8, out_dim: int = 2,
                 seed: int = 2024):
        rs = np.random.RandomState(seed)
        self.w1 = rs.randint(-3, 4, size=(input_dim, hidden)).astype(np.int64)
        self.b1 = rs.randint(-3, 4, size=hidden).astype(np.int64)
        self.w2 = rs.randint(-3, 4, size=(hidden, out_dim)).astype(np.int64)
        self.b2 = rs.randint(-3, 4, size=out_dim).astype(np.int64)
        self.input_dim = input_dim
        self.out_dim = out_dim

    def forward(self, x: np.ndarray) -> np.ndarray:
        """x: (n, input_dim) float64 or int64 → (n, out_dim)."""
        h = x @ self.w1.astype(x.dtype) + self.b1.astype(x.dtype)
        np.maximum(h, 0, out=h)
        return h @ self.w2.astype(x.dtype) + self.b2.astype(x.dtype)


@register("tensorflow")
class TensorflowStage(Stage):
    """Actor-pool model scorer (use via
    ``ds.map_batches(TensorflowStage.actor(...), concurrency=N)`` or
    the Stage ``apply``)."""

    def __init__(self, input_field: str, input_dim: int | None = None,
                 include_input_fields: bool = True,
                 normalization_value: float | None = None,
                 hidden: int = 8, out_dim: int = 2, seed: int = 2024,
                 model_file: str | None = None,
                 **kw):
        super().__init__(**kw)
        if input_dim is None and model_file is None:
            raise ValueError(
                "tensorflow stage: input_dim is required unless a "
                "model_file provides it")
        self.input_field = input_field
        self.input_dim = input_dim
        self.include_input_fields = include_input_fields
        self.normalization_value = normalization_value
        self.hidden = hidden
        self.out_dim = out_dim
        self.seed = seed
        self.model_file = model_file

    def apply(self, ds):
        kw = dict(input_field=self.input_field, input_dim=self.input_dim,
                  include_input_fields=self.include_input_fields,
                  normalization_value=self.normalization_value,
                  hidden=self.hidden, out_dim=self.out_dim, seed=self.seed,
                  model_file=self.model_file)
        return ds.map_batches(_TfScoreBatch, fn_constructor_kwargs=kw,
                              batch_format="pandas", concurrency=(1, 64))


class _TfScoreBatch:
    """The per-actor callable: model built ONCE in __init__ (the
    interpreter-per-instance contract), vectorized matmul per batch."""

    def __init__(self, input_field: str, input_dim: int | None = None,
                 include_input_fields: bool = True,
                 normalization_value: float | None = None,
                 hidden: int = 8, out_dim: int = 2, seed: int = 2024,
                 model_file: str | None = None):
        if model_file is not None:
            # real .tflite: parsed + weights materialized once per
            # actor (build_interpreter contract, tensorflow.c:87-97)
            from .tflite import load_tflite
            self.model = load_tflite(model_file)
            if input_dim is not None and input_dim != self.model.input_dim:
                raise ValueError(
                    f"tensorflow stage: input_dim {input_dim} != model "
                    f"input {self.model.input_dim}")
        else:
            self.model = FixedMlp(input_dim, hidden=hidden,
                                  out_dim=out_dim, seed=seed)
        self.input_field = input_field
        self.include = include_input_fields
        self.norm = normalization_value

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        col = df[self.input_field]
        # drop records without the field / wrong input size
        # (tensorflow.c only emits records that passed inference)
        ok = col.map(lambda v: v is not None and hasattr(v, "__len__")
                     and len(v) == self.model.input_dim)
        sub = df[ok.to_numpy(dtype=bool)]
        if len(sub) == 0:
            out = (sub if self.include
                   else sub[[]]).copy()
            out["inference_time"] = pd.Series([], dtype="float64")
            out["tf_out"] = pd.Series([], dtype=object)
            return out
        t0 = time.perf_counter()
        x = np.stack(sub[self.input_field].to_numpy()).astype(np.float64)
        if self.norm is not None:
            x = x / self.norm
        y = self.model.forward(x)
        dt = time.perf_counter() - t0
        out = sub.copy() if self.include else sub[[]].copy()
        out["inference_time"] = np.float64(dt)
        out["tf_out"] = list(y)
        return out
