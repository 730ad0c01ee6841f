"""SoftRMS distributed trainer (optim.py): convergence + scoring."""

import math
import random

import numpy as np
import pytest

from seafan_spark.encode import append_cat, make_one_hot
from seafan_spark.model import parse_modspec
from seafan_spark.optim import fit_softrms
from seafan_spark.sources import vec_to_pipe
from pyspark.sql import functions as F


def _binary_pipe(spark, n=400, seed=7):
    rng = random.Random(seed)
    x1, x2, y = [], [], []
    for _ in range(n):
        a, b = rng.uniform(-2, 2), rng.uniform(-2, 2)
        x1.append(a)
        x2.append(b)
        y.append(1.0 if a + 2 * b > 0 else 0.0)
    return vec_to_pipe(spark, {"x1": x1, "x2": x2, "y": y})


def test_softrms_binary_converges(spark):
    p = _binary_pipe(spark)
    ms = parse_modspec(["Input(x1+x2)", "FC(size:1, activation:sigmoid)", "Target(y)"])
    model = fit_softrms(p, ms, max_iter=150, lr=0.2, patience=30)
    # training loss decreased substantially
    assert model.loss_history[-1] < 0.6 * model.loss_history[0]
    # score via the JVM column path and check training accuracy
    from seafan_spark.model import _assemble, _label_col
    from pyspark.ml.functions import vector_to_array

    d_lab, label, _, _ = _label_col(p, ms)
    d, _, _ = _assemble(p._derive(d_lab), ms)
    scored = d.withColumn("_probs", model.prob_col(vector_to_array(F.col("_features"))))
    acc = (
        scored.withColumn("_pred", (F.element_at("_probs", 2) > 0.5).cast("double"))
        .agg(F.avg((F.col("_pred") == F.col(label)).cast("double")))
        .collect()[0][0]
    )
    assert acc > 0.9


def test_softrms_multiclass(spark):
    rng = random.Random(11)
    x1, x2, lab = [], [], []
    centers = {"a": (0.0, 2.0), "b": (2.0, -2.0), "c": (-2.0, -2.0)}
    for _ in range(300):
        k = rng.choice("abc")
        cx, cy = centers[k]
        x1.append(cx + rng.gauss(0, 0.4))
        x2.append(cy + rng.gauss(0, 0.4))
        lab.append(k)
    p = vec_to_pipe(spark, {"x1": x1, "x2": x2, "lab": lab})
    p = append_cat(p, "lab")
    p = make_one_hot(p, "lab", "lab_oh")
    ms = parse_modspec(["Input(x1+x2)", "FC(size:3, activation:softmax)", "Target(lab_oh)"])
    model = fit_softrms(p, ms, max_iter=150, lr=0.2, patience=30)
    assert model.n_classes == 3
    assert model.loss_history[-1] < 0.5 * model.loss_history[0]


def test_softrms_rejects_regression(spark):
    from seafan_spark.model import ModSpecError

    p = _binary_pipe(spark, n=20)
    ms = parse_modspec(["Input(x1+x2)", "FC(size:1, activation:linear)", "Target(y)"])
    with pytest.raises(ModSpecError, match="classification"):
        fit_softrms(p, ms)
