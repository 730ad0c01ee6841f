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


# ---------------------------------------------------------------------------
# fit_nn: full-architecture trainer
# ---------------------------------------------------------------------------


def test_nn_backprop_matches_numeric_gradient():
    """Pure-numpy check: the partition function's analytic gradient equals
    finite differences for all three costs (no Spark needed — the partition
    fn is plain Python over a pandas batch)."""
    import pandas as pd

    from seafan_spark.optim import (
        _Block,
        _act_f,
        _head_f,
        _input_concat,
        _nn_partial,
        _shapes,
        _unpack,
    )

    rng = np.random.default_rng(0)
    n = 40
    blocks = [_Block("x1", "cts"), _Block("oh", "oh", cats=4), _Block("em", "emb", cats=3, k=2)]
    acts = [("leakyrelu", 0.1), ("sigmoid", 0.0)]
    C = 3
    shapes = _shapes(blocks, [5, 4, C])
    nparam = sum(r * c for _, (r, c) in shapes)
    w = rng.normal(0, 0.5, nparam)
    x1 = rng.normal(size=n)
    oh = np.eye(4)[rng.integers(0, 4, n)]
    em = np.eye(3)[rng.integers(0, 3, n)]
    y = rng.integers(0, C, n).astype(float)
    pdf = pd.DataFrame({"x1": x1, "oh": list(oh), "em": list(em), "_l": y})

    def forward_all(wf):
        emb, fcs = _unpack(wf, shapes)
        h = _input_concat(blocks, [x1[:, None], oh, em], emb)
        for li, W in enumerate(fcs):
            a = h @ W[:-1] + W[-1]
            h = _act_f(acts[li], a) if li < len(fcs) - 1 else _head_f("softmax", a)
        return h

    def nll_sum(wf):
        p = forward_all(wf)
        return -np.log(p[np.arange(n), y.astype(int)]).sum()

    def softrms_loss(wf):
        r = forward_all(wf) - np.eye(C)[y.astype(int)]
        return np.sqrt((r * r).sum(axis=0) / n)[1:].sum()

    def run(cost, lw=None):
        pf = _nn_partial(blocks, shapes, acts, "softmax", C, cost, [0.0] * 3, 1, 1, 1.0, w, lw)
        row = next(pf([pdf]))
        return np.array(row["g"][0]), np.array(row["ls"][0]), int(row["n"][0])

    eps = 1e-6
    idx = rng.choice(nparam, 25, replace=False)

    g, ls, _ = run("ce")
    num = np.array(
        [(nll_sum(w + eps * np.eye(nparam)[i]) - nll_sum(w - eps * np.eye(nparam)[i])) / (2 * eps) for i in idx]
    )
    assert np.abs(num - g[idx]).max() / (np.abs(num).max() + 1e-9) < 1e-4
    assert abs(ls[0] - nll_sum(w)) < 1e-8

    _, ss, n2 = run("_fwd_ss")
    L = np.sqrt(ss / n2)
    lw = np.zeros(C)
    lw[L > 0] = 1.0 / (n2 * L[L > 0])
    lw[0] = 0.0
    g2, _, _ = run("softrms", lw[None, :])
    num2 = np.array(
        [
            (softrms_loss(w + eps * np.eye(nparam)[i]) - softrms_loss(w - eps * np.eye(nparam)[i])) / (2 * eps)
            for i in idx
        ]
    )
    assert np.abs(num2 - g2[idx]).max() / (np.abs(num2).max() + 1e-9) < 1e-4


def test_nn_multiclass_embedding_dropout(spark, tmp_path):
    """MLP with a learned embedding + dropout separates 3 gaussian blobs
    keyed by a categorical, and survives a model-layer save/load round trip."""
    from seafan_spark.model import (
        add_fitted,
        fit,
        load_model,
        parse_modspec,
        save_model,
    )

    rng = random.Random(5)
    x1, x2, grp, lab = [], [], [], []
    centers = {"a": (0.0, 2.0), "b": (2.0, -2.0), "c": (-2.0, -2.0)}
    for _ in range(400):
        k = rng.choice("abc")
        cx, cy = centers[k]
        x1.append(cx + rng.gauss(0, 0.4))
        x2.append(cy + rng.gauss(0, 0.4))
        grp.append(k)
        lab.append(k)
    p = vec_to_pipe(spark, {"x1": x1, "x2": x2, "grp": grp, "lab": lab})
    p = append_cat(p, "lab")
    p = make_one_hot(p, "lab", "lab_oh")
    p = append_cat(p, "grp")
    p = make_one_hot(p, "grp", "grp_oh")
    ms = parse_modspec(
        [
            "Input(x1+x2+E(grp_oh,2))",
            "FC(size:6, activation:leakyrelu(0.1))",
            "Dropout(.15)",
            "FC(size:3, activation:softmax)",
            "Target(lab_oh)",
        ]
    )
    fr = fit(p, ms, cost="ce", max_iter=120, lr=0.1, patience=25)
    nn = fr.model
    assert nn.loss_history[-1] < 0.4 * nn.loss_history[0]
    assert nn.emb["grp_oh"].shape == (3, 2)

    scored = add_fitted(fr, p, name="fit")
    from seafan_spark.encode import cat_code_col

    code = cat_code_col(scored.fts.get("lab")).cast("double")
    acc = (
        scored.df.withColumn("_code", code)
        .agg(F.avg((F.col("fit") == F.col("_code")).cast("double")))
        .collect()[0][0]
    )
    assert acc > 0.9

    save_model(fr, str(tmp_path / "nnmodel"))
    fr2 = load_model(str(tmp_path / "nnmodel"))
    a = scored.df.select(F.sum("fit").alias("s")).collect()[0]["s"]
    b = (
        add_fitted(fr2, p, name="fit").df.select(F.sum("fit").alias("s")).collect()[0]["s"]
    )
    assert math.isclose(a, b, rel_tol=1e-9)


def test_nn_regression_rms(spark):
    from seafan_spark.model import fit, parse_modspec, predict

    rng = random.Random(3)
    x1, x2, y = [], [], []
    for _ in range(400):
        a, b = rng.uniform(-1, 1), rng.uniform(-1, 1)
        x1.append(a)
        x2.append(b)
        y.append(math.sin(2 * a) + 0.5 * b)
    p = vec_to_pipe(spark, {"x1": x1, "x2": x2, "y": y})
    ms = parse_modspec(
        [
            "Input(x1+x2)",
            "FC(size:8, activation:relu)",
            "FC(size:1, activation:linear)",
            "Target(y)",
        ]
    )
    fr = fit(p, ms, cost="rms", max_iter=250, lr=0.05, patience=40)
    assert fr.kind == "nn_linear"
    assert fr.model.loss_history[-1] < 0.5 * fr.model.loss_history[0]
    scored = predict(fr, p, name="yhat")
    sse, sst = (
        scored.df.agg(
            F.sum((F.col("yhat") - F.col("y")) ** 2).alias("sse"),
            F.sum((F.col("y") - F.lit(sum(y) / len(y))) ** 2).alias("sst"),
        )
        .collect()[0]
    )
    assert 1.0 - sse / sst > 0.7  # R^2


def test_nn_softrms_with_hidden_layer(spark):
    from seafan_spark.model import fit, parse_modspec

    p = _binary_pipe(spark, n=300, seed=9)
    ms = parse_modspec(
        ["Input(x1+x2)", "FC(size:4, activation:relu)", "FC(size:1, activation:sigmoid)", "Target(y)"]
    )
    fr = fit(p, ms, cost="softrms", max_iter=120, lr=0.1, patience=25)
    assert fr.model.loss_history[-1] < 0.7 * fr.model.loss_history[0]


# ---------------------------------------------------------------------------
# tree merge of per-task gradient rows
# ---------------------------------------------------------------------------


def test_tree_merge_gradients_matches_driver_sum(spark):
    """JVM-side bucketed summation must agree with summing every row on
    the driver (associative float addition; identical up to tolerance)."""
    import seafan_spark.optim as optim

    rng = np.random.default_rng(3)
    W, L, P = 37, 3, 24
    rows = [
        (rng.normal(size=W).tolist(), rng.normal(size=L).tolist(), int(i + 1))
        for i in range(P)
    ]
    df = spark.createDataFrame(rows, "g array<double>, ls array<double>, n long").repartition(P)
    merged = optim._tree_merge_gradients(df, [("g", W), ("ls", L)], buckets=5).collect()
    g = np.zeros(W); ls = np.zeros(L); n = 0
    for r in merged:
        g += np.array(r["g"]); ls += np.array(r["ls"]); n += r["n"]
    want_g = np.sum([r[0] for r in rows], axis=0)
    want_ls = np.sum([r[1] for r in rows], axis=0)
    assert n == sum(r[2] for r in rows)
    assert np.allclose(g, want_g) and np.allclose(ls, want_ls)
    assert len(merged) <= 5


def test_grad_pass_tree_path_matches_direct(spark):
    """_grad_pass with the tree merge forced on returns the same
    (G, ss, n) as the direct-collect path."""
    from seafan_spark.model import _assemble, _label_col, parse_modspec
    from seafan_spark.optim import _grad_pass

    p = _binary_pipe(spark, n=200, seed=13)
    ms = parse_modspec(["Input(x1+x2)", "FC(size:1, activation:sigmoid)", "Target(y)"])
    d_lab, label, _, _ = _label_col(p, ms)
    d, _, n_feat = _assemble(p._derive(d_lab), ms)
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as FF

    d2 = d.select(
        vector_to_array(FF.col("_features")).alias("_f"),
        FF.col(label).cast("long").alias("_l"),
    ).repartition(8)
    W = np.random.default_rng(5).normal(size=(n_feat + 1, 2))
    G1, ss1, n1 = _grad_pass(d2, W, 2, nparts=None)
    G2, ss2, n2 = _grad_pass(d2, W, 2, nparts=10_000)  # force tree path
    assert n1 == n2
    assert np.allclose(G1, G2) and np.allclose(ss1, ss2)


def test_nn_transform_fixed_weights_matches_numpy(spark):
    """NNModel.transform (the oracled Arrow scoring path) with fixed
    weights = the hand-rolled forward pass."""
    import numpy as np

    from seafan_spark.optim import NNModel, _Block

    w1 = np.array([[0.25, -0.125, 0.5], [0.375, 0.125, -0.25]] + [[0.0, 0.125, -0.125]])
    w2 = np.array([[0.5], [-0.375], [0.25], [0.125]])
    model = NNModel(
        blocks=[_Block("x1", "cts"), _Block("x2", "cts")],
        emb={}, fcs=[w1, w2], acts=[("leakyrelu", 0.1)],
        head="linear", n_classes=0,
    )
    rows = [(i, 0.1 * i - 0.5, 0.03 * i) for i in range(20)]
    df = spark.createDataFrame(rows, "id int, x1 double, x2 double")
    got = {r["id"]: r["prediction"] for r in model.transform(df).collect()}
    X = np.array([[r[1], r[2]] for r in rows])
    a = X @ w1[:-1] + w1[-1]
    h = np.where(a > 0, a, 0.1 * a)
    pred = (h @ w2[:-1] + w2[-1]).ravel()
    for i in range(20):
        assert got[i] == pytest.approx(pred[i], abs=1e-12), i
