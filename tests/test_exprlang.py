"""Expression-language acceptance gate: the reference's 42-formula corpus
(parser_test.go:861-969), error table (:753-771), typed-comparison table
(:669-698), string/date function goldens (:78-396, 561-834), npv/irr
(:726-750), range (:836-858) and Loop (:971-1001), ported with identical
inputs and expected vectors."""

import datetime as dt

import pytest

from seafan_spark.exprlang import add_to_pipe, evaluate, loop
from seafan_spark.exprlang.compiler import CompileError
from seafan_spark.exprlang.parser import ParseError, parse
from seafan_spark.ftypes import FRole
from seafan_spark.sources import vec_to_pipe


@pytest.fixture()
def cd_pipe(spark):
    return vec_to_pipe(spark, {"c": [1.0, 2.0], "D": [3.0, 10.0]})


CORPUS = [
    ("sum(c) - npv(.1,D)", [-9.09090909090909]),
    ("if(c==1.0,D==3.0,c)", [1, 2]),
    ("count(c)", [2]),
    ("min(c)", [1]),
    ("prodAfter(D)", [30, 10]),
    ("prodBefore(D)", [3, 30]),
    ("lag(c,42)", [42, 1]),
    ("c+D", [4, 12]),
    ("cumeBefore(c)", [1, 3]),
    ("if(c==1,log(c),-c)", [0, -2]),
    ("max(c)", [2]),
    ("c-D-D", [-5, -18]),
    ("row(c)", [0, 1]),
    ("index(D,1-(c-1))", [10, 3]),
    ("countBefore(c)", [1, 2]),
    ("-D*3 + D", [-6, -20]),
    ("countAfter(c)", [2, 1]),
    ("cumeAfter(c)", [3, 2]),
    ("std(c)", [0.7071067811865476]),
    ("median(c)", [1.5]),
    ("mean(-c)", [-1.5]),
    ("sum(c+D)", [16]),
    ("sum(c)", [3]),
    ("if(c-1.5,1,0)", [0, 1]),
    ("-D + 4*c", [1, -2]),
    ("-(D ^ (c-1))", [-1, -10]),
    ("log(c)*(c-2) + D", [3, 10]),
    ("(((-(c))))", [-1, -2]),
    ("c >=3 || D==10", [0, 1]),
    ("if(c>=2 || D==3, 1, 0)", [1, 1]),
    ("c+3*D", [10, 32]),
    ("(c-D)*(c+D)", [-8, -96]),
    ("if(c>1,c,D)", [3, 2]),
    ("if(c>1 && D>2,1,0)", [0, 1]),
    ("-(c+3)*(D-3)", [0, -35]),
    ("if(c==1,log(c),c)", [0, 2]),
]


@pytest.mark.parametrize("formula,expected", CORPUS, ids=[f for f, _ in CORPUS])
def test_corpus(cd_pipe, formula, expected):
    got = evaluate(cd_pipe, formula)
    assert got == pytest.approx(expected)


@pytest.fixture()
def typed_pipe(spark):
    # c string, D float, e string (parser_test.go:669-698)
    return vec_to_pipe(
        spark,
        {"c": ["0", "b", "0", "d"], "D": [0.1, 0.2, 0.3, 0.6], "e": ["0", "0", "0", "abc"]},
    )


TYPED_OK = [
    ("c=='b'", [0, 1, 0, 0]),
    ("c=='0'", [1, 0, 1, 0]),
    ("c==e", [1, 0, 1, 0]),
    ("e=='abc'", [0, 0, 0, 1]),
    ("D==.1", [1, 0, 0, 0]),
    ("c > 'b'", [0, 0, 0, 1]),
    ("c>='b'", [0, 1, 0, 1]),
]

TYPED_ERR = ["c!=D", "c*2", "e+'a'", "log(c)"]


@pytest.mark.parametrize("formula,expected", TYPED_OK, ids=[f for f, _ in TYPED_OK])
def test_typed_comparisons(typed_pipe, formula, expected):
    assert evaluate(typed_pipe, formula) == pytest.approx(expected)


@pytest.mark.parametrize("formula", TYPED_ERR)
def test_typed_errors(typed_pipe, formula):
    with pytest.raises(CompileError):
        evaluate(typed_pipe, formula)


def test_error_table(spark):
    # {c+f, f+1, f*f, index(c,f), c^f} compile errors; log(e) runtime error
    p = vec_to_pipe(
        spark,
        {
            "c": [1.0, 2.0, 3.0, 4.0],
            "D": [0.1, 0.2, 0.3, 0.4],
            "e": [6.0, 0.0, 0.0, 0.0],
            "f": ["x", "a", "z", "t"],
        },
    )
    for expr in ["c+f", "f+1", "f*f", "index(c,f)", "c^f"]:
        with pytest.raises(CompileError):
            evaluate(p, expr)
    with pytest.raises(Exception):  # runtime: log of 0
        evaluate(p, "log(e)")


def test_summary_npv_irr_max(spark):
    p = vec_to_pipe(
        spark,
        {
            "c": [1.0, 2.0, 3.0, 4.0],
            "D": [0.1, 0.2, 0.3, 0.4],
            "e": [6.0, 0.0, 0.0, 0.0],
            "f": ["x", "a", "z", "t"],
        },
    )
    assert evaluate(p, "max(f)") == ["z"]
    assert evaluate(p, "irr(e,c)")[0] == pytest.approx(0.3169080407719, abs=1e-4)
    assert evaluate(p, "npv(.1,c)")[0] == pytest.approx(8.302778, abs=1e-4)
    assert evaluate(p, "npv(D,c)")[0] == pytest.approx(5.8995, abs=1e-4)
    assert evaluate(p, "sse(c,D)")[0] == pytest.approx(
        sum((c - d) ** 2 for c, d in zip([1, 2, 3, 4], [0.1, 0.2, 0.3, 0.4]))
    )
    assert evaluate(p, "mad(c,D)")[0] == pytest.approx(
        sum(abs(c - d) for c, d in zip([1, 2, 3, 4], [0.1, 0.2, 0.3, 0.4]))
    )


def test_lag_kind_coercion(spark):
    # lag on a string column fills the numeric miss as "%.2f"
    # (parser_test.go:774-786)
    p = vec_to_pipe(spark, {"c": [1.0, 2.0], "D": ["20230228", "20230301"]})
    assert evaluate(p, "lag(c,3)") == [3.0, 1.0]
    assert evaluate(p, "lag(D,3)") == ["3.00", "20230228"]


def test_tostring_todate(spark):
    # parser_test.go:822-834
    p = vec_to_pipe(spark, {"c": [1.0, 2.0], "D": ["20230228", "20230301"]})
    assert evaluate(p, "toString(cat(c))") == ["1", "2"]
    assert evaluate(p, "toString(c)") == ["1.00", "2.00"]
    assert evaluate(p, "toString(toDate(D))") == ["2/28/2023", "3/1/2023"]
    assert evaluate(p, "toFloatDP(c)") == [1.0, 2.0]


def test_todate_formats(spark):
    # parser_test.go:649-666
    p = vec_to_pipe(spark, {"c": ["3/25/2022", "20230228"]})
    assert evaluate(p, "toDate(c)") == [dt.date(2022, 3, 25), dt.date(2023, 2, 28)]


def test_cat_role(spark):
    p = vec_to_pipe(spark, {"c": [1.0, 2.0]})
    out = add_to_pipe(p, "cat(c)", "catval")
    assert out.fts.get("catval").role == FRole.CAT


def test_maxe_mine_typed(spark):
    # pipeTest6 (parser_test.go:78-130)
    p = vec_to_pipe(
        spark,
        {
            "x": [1.0, 20.0],
            "y": [2.0, -1.0],
            "s1": ["a", "bb"],
            "s2": ["b", "a"],
            "d1": [dt.date(2023, 3, 1), dt.date(1990, 10, 12)],
            "d2": [dt.date(2020, 3, 1), dt.date(2000, 1, 1)],
        },
    )
    assert evaluate(p, "maxE(x,y)") == [2.0, 20.0]
    assert evaluate(p, "maxE(s1,s2)") == ["b", "bb"]
    assert evaluate(p, "minE(d1,d2)") == [dt.date(2020, 3, 1), dt.date(1990, 10, 12)]


def test_multi_minus(spark):
    # pipeTest8/9 (parser_test.go:132-181)
    p8 = vec_to_pipe(
        spark,
        {"a": [1.0, 3.0, 3.0], "b": [2.0, 1.0, -1.0], "c": [3.0, 1.0, -1.0], "d": [4.0, 1.0, -2.0]},
    )
    assert evaluate(p8, "a-if(b>0,b,b)-if(c>0,c,c)-if(d>0,d,d)") == [-8, 0, 7]
    p9 = vec_to_pipe(spark, {"a": ["aaabb", "abcdd", "accccd"]})
    assert evaluate(p9, "strLen(a)-strCount(a,'a')-strCount(a,'b')-strCount(a,'c')") == [0, 2, 1]


def test_string_functions(spark):
    # pipeTest7 (parser_test.go:183-337)
    p = vec_to_pipe(
        spark,
        {
            "str": ["testme", "hello there", "goodbye", "abbbbc"],
            "s": [1, 7, 5, 2],
            "l": [2, 10, 2, 4],
            "look": ["t", "e", "y", "b"],
        },
    )
    assert evaluate(p, "substr(str,s,l)") == ["te", "there", "by", "bbbb"]
    assert evaluate(p, "substr(str,3,l)") == ["st", "llo there", "od", "bbbc"]
    assert evaluate(p, "substr(str,s,1)") == ["t", "t", "b", "b"]
    assert evaluate(p, "strPos(str,look)") == [1, 2, 6, 2]
    assert evaluate(p, "strPos(str,'o')") == [-1, 5, 2, -1]
    assert evaluate(p, "strCount(str,look)") == [2, 3, 1, 4]
    assert evaluate(p, "strCount(str,'c')") == [0, 0, 0, 1]
    assert evaluate(p, "strLen(str)") == [6, 11, 7, 6]


def test_date_functions(spark):
    # pipeTest5 (parser_test.go:359-396) + pipeTest2 dateAdd golden (:561-647)
    p5 = vec_to_pipe(
        spark,
        {
            "date1": [dt.date(2023, 3, 1), dt.date(2023, 10, 14), dt.date(2023, 12, 10), dt.date(2020, 2, 12)],
            "date2": [dt.date(2023, 3, 30), dt.date(2023, 9, 2), dt.date(2022, 4, 15), dt.date(2016, 10, 10)],
        },
    )
    assert evaluate(p5, "dateDiff(date1,date2,'year')") == [0, 0, 1, 4]
    assert evaluate(p5, "dateDiff(date1,date2,'month')") == [0, 1, 20, 40]

    p2 = vec_to_pipe(
        spark,
        {
            "row": [0, 2, 3, 4, 1, 100],
            "date": [
                dt.date(2023, 3, 1),
                dt.date(2023, 4, 1),
                dt.date(2023, 5, 1),
                dt.date(2023, 6, 1),
                dt.date(2023, 7, 1),
                dt.date(2020, 8, 1),
            ],
        },
    )
    assert evaluate(p2, "dateAdd(date,row)") == [
        dt.date(2023, 3, 1),
        dt.date(2023, 6, 1),
        dt.date(2023, 8, 1),
        dt.date(2023, 10, 1),
        dt.date(2023, 8, 1),
        dt.date(2028, 12, 1),
    ]
    assert evaluate(p2, "if(date=='3/1/2023',1,0)") == [1, 0, 0, 0, 0, 0]
    assert evaluate(p2, "if(date>'3/1/2023',1,0)") == [0, 1, 1, 1, 1, 0]
    assert evaluate(p2, "year(date)") == [2023, 2023, 2023, 2023, 2023, 2020]
    assert evaluate(p2, "month(date)") == [3, 4, 5, 6, 7, 8]
    assert evaluate(p2, "day(toLastDayOfMonth(date))") == [31, 30, 31, 30, 31, 31]


def test_range_one2many(spark):
    # range(0,10) on a 1-row pipe -> 10 rows (parser_test.go:836-858)
    p = vec_to_pipe(spark, {"c": [1.0], "D": [30.0]})
    out = add_to_pipe(p, "range(0,10)", "rng")
    assert out.row_count() == 10
    assert out.collect_field("rng") == [float(i) for i in range(10)]
    assert out.collect_field("c") == [1.0] * 10


def test_loop(spark):
    # parser_test.go:971-1001
    p = vec_to_pipe(spark, {"c": [1.0, 2.0], "D": [3.0, 10.0]})
    out = loop(p, "x", 1, 3, [("D*x", "r"), ("1-r+x", "y"), ("c+x", "c")])
    assert out.collect_field("r") == [6.0, 20.0]
    assert out.collect_field("y") == [-3.0, -17.0]
    assert out.collect_field("c") == [4.0, 5.0]


def test_summary_broadcast_in_row_expr(cd_pipe):
    # summary scalar broadcasts against vectors (parser_test.go:868)
    assert evaluate(cd_pipe, "c - mean(c)") == [-0.5, 0.5]


def test_grouped_summary_generalization(spark):
    # partition_by: per-group scalars — the scale path seafan lacks
    p = vec_to_pipe(spark, {"g": ["a", "a", "b"], "v": [1.0, 3.0, 10.0]})
    got = evaluate(p, "v - mean(v)", partition_by=["g"])
    assert got == [-1.0, 1.0, 0.0]


def test_parse_errors(spark):
    for bad in ["", "c+", "(c", "c)"]:
        with pytest.raises(ParseError):
            parse(bad)
    parse("if(c,1)")  # parses fine; arity checked at compile
    p = vec_to_pipe(spark, {"c": [1.0]})
    with pytest.raises(CompileError):
        evaluate(p, "if(c,1)")
    with pytest.raises(CompileError):
        evaluate(p, "noSuchFn(c)")


def test_exist(spark):
    p = vec_to_pipe(spark, {"x": [1.0, 2.0]})
    assert evaluate(p, "exist(x, 0)") == [1.0, 2.0]
    assert evaluate(p, "exist(nope, x*2)") == [2.0, 4.0]


def test_evaluate_on_fresh_parquet_source(spark, tmp_path):
    # regression: a pipeline with NO pre-existing order column must not
    # lose _rid between frame capture and the final orderBy
    from seafan_spark.sources import parquet_to_pipe

    path = str(tmp_path / "t")
    spark.createDataFrame([(1.0,), (2.0,)], "x double").write.parquet(path)
    p = parquet_to_pipe(spark, path)
    assert sorted(evaluate(p, "x + 1")) == [2.0, 3.0]
    p2 = parquet_to_pipe(spark, path)
    assert sorted(evaluate(p2, "x - mean(x)")) == [-0.5, 0.5]


def test_evaluate_partitioned_summary_is_per_row(spark):
    p = vec_to_pipe(spark, {"x": [1.0, 2.0, 10.0, 20.0], "g": ["a", "a", "b", "b"]})
    got = evaluate(p, "mean(x)", partition_by=["g"])
    assert got == [1.5, 1.5, 15.0, 15.0]


def test_index_preserves_nulls(spark):
    p = vec_to_pipe(spark, {"x": [10.0, None, 30.0], "i": [0.0, 1.0, 2.0]})
    got = evaluate(p, "index(x, i)")
    assert got == [10.0, None, 30.0]


def test_compile_expression_exposes_ctx(spark):
    from seafan_spark.exprlang import compile_expression

    p = vec_to_pipe(spark, {"x": [1.0, 3.0]})
    tc = compile_expression(p, "x - mean(x)")
    frame = tc.ctx.frame()
    vals = sorted(
        r["v"] for r in frame.select(tc.col.alias("v")).collect()
    )
    assert vals == [-1.0, 1.0]
