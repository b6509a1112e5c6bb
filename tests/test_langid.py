"""Model-based language ID: determinism, separability, DuckDB parity.

Multi-script fixture pools (en/de/es/fr/zh) train a hashed-char-2-gram
softmax; held-out sentences from the same pools must classify correctly
(scripts and char-bigram distributions are highly separable), the fit must
be bit-deterministic, and the compiled scoring expressions must match the
SQL oracle built by ``lang_scoring_sql``.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from anomalyzer_spark.functions import langid

POOLS = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "she said that they would meet again after the long winter months",
        "this is a test of the language identification system with words",
        "children were playing in the park while their parents watched",
        "the weather report said it would rain throughout the weekend",
        "he wrote a letter to his friend about the journey through wales",
        "reading books in the evening is a habit that many people share",
        "the committee decided to postpone the meeting until next week",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund am fluss",
        "sie sagte dass sie sich nach dem langen winter wiedersehen würden",
        "dies ist ein test des systems zur erkennung der deutschen sprache",
        "die kinder spielten im park während ihre eltern zuschauten",
        "der wetterbericht sagte regen für das ganze wochenende voraus",
        "er schrieb seinem freund einen brief über die reise durch bayern",
        "abends bücher zu lesen ist eine gewohnheit vieler menschen",
        "der ausschuss beschloss die sitzung auf nächste woche zu verschieben",
    ],
    "es": [
        "el rápido zorro marrón salta sobre el perro perezoso junto al río",
        "ella dijo que se volverían a encontrar después del largo invierno",
        "esta es una prueba del sistema de identificación de idiomas",
        "los niños jugaban en el parque mientras sus padres miraban",
        "el pronóstico del tiempo anunció lluvia durante el fin de semana",
        "escribió una carta a su amigo sobre el viaje por andalucía",
        "leer libros por la noche es una costumbre de mucha gente",
        "el comité decidió aplazar la reunión hasta la próxima semana",
    ],
    "fr": [
        "le rapide renard brun saute par dessus le chien paresseux au bord",
        "elle a dit qu'ils se reverraient après les longs mois d'hiver",
        "ceci est un test du système d'identification de la langue",
        "les enfants jouaient dans le parc pendant que leurs parents regardaient",
        "la météo annonçait de la pluie pendant tout le week end",
        "il a écrit une lettre à son ami sur le voyage en provence",
        "lire des livres le soir est une habitude que beaucoup partagent",
        "le comité a décidé de reporter la réunion à la semaine prochaine",
    ],
    "zh": [
        "敏捷的棕色狐狸跳过了河边那只懒惰的狗",
        "她说漫长的冬天过后他们会再次见面",
        "这是一个语言识别系统的测试句子",
        "孩子们在公园里玩耍而他们的父母在旁边看着",
        "天气预报说整个周末都会下雨",
        "他给朋友写了一封关于旅行的信",
        "晚上读书是很多人共有的习惯",
        "委员会决定把会议推迟到下周",
        "春天的花园里开满了各种颜色的花朵",
        "图书馆每天早上九点开门晚上十点关门",
        "火车站前面的广场上聚集了许多旅客",
        "科学家们正在研究新的能源技术方案",
        "这家餐厅的菜味道很好价格也很合理",
        "学习一门新的语言需要时间和耐心",
        "电影院今晚放映一部著名导演的新作品",
        "城市的夜景从山顶上看起来格外美丽",
    ],
}

#: held-out per language — NOT in the training pools
HELD_OUT = {
    "en": "a small group of students finished their homework before dinner",
    "de": "eine kleine gruppe von schülern beendete ihre hausaufgaben vor dem essen",
    "es": "un pequeño grupo de estudiantes terminó sus deberes antes de cenar",
    "fr": "un petit groupe d'étudiants a terminé ses devoirs avant le dîner",
    "zh": "一小群学生在晚饭前完成了他们的作业",
}


@pytest.fixture(scope="module")
def model(spark):
    labeled = {
        lang: spark.createDataFrame([(s,) for s in pool], "text string")
        for lang, pool in POOLS.items()
    }
    return langid.train_lang_model(labeled, sample_rows=100, iters=200)


def test_training_is_deterministic(spark, model):
    labeled = {
        lang: spark.createDataFrame([(s,) for s in pool], "text string")
        for lang, pool in POOLS.items()
    }
    again = langid.train_lang_model(labeled, sample_rows=100, iters=200)
    assert again == model


def test_training_set_classified_correctly(spark, model):
    rows = [(i * 100 + j, lang, s)
            for i, (lang, pool) in enumerate(sorted(POOLS.items()))
            for j, s in enumerate(pool)]
    df = spark.createDataFrame(rows, "doc_id long, truth string, text string")
    # compare in Python, not .where(pred == truth): consuming ONLY the
    # argmax column lets CollapseProject re-merge score_lang's staged
    # projections into one ~10k-node filter expression (262s optimize)
    truth = {r[0]: r[1] for r in rows}
    got = langid.score_lang(df, model).collect()
    acc = sum(truth[r["doc_id"]] == r["lang_pred_model"] for r in got) \
        / len(rows)
    assert acc >= 0.95, f"train accuracy {acc}"


def test_held_out_separability(spark, model):
    rows = [(i, lang, s)
            for i, (lang, s) in enumerate(sorted(HELD_OUT.items()))]
    df = spark.createDataFrame(rows, "doc_id long, truth string, text string")
    truth = {r[0]: r[1] for r in rows}
    got = {truth[r["doc_id"]]: r["lang_pred_model"]
           for r in langid.score_lang(df, model).collect()}
    wrong = {k: v for k, v in got.items() if k != v}
    assert not wrong, f"misclassified held-out: {wrong}"


def test_short_and_empty_text(spark, model):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "日本")], "doc_id long, text string")
    rows = langid.score_lang(df, model).collect()
    assert len(rows) == 3
    langs = set(model["langs"])
    for r in rows:
        assert r["lang_pred_model"] in langs
        tot = sum(r[f"prob_{lg}"] for lg in langs)
        assert abs(tot - 1.0) < 1e-4


def test_duckdb_scoring_parity(spark, model):
    rows = [(i, s) for i, s in enumerate(
        [*HELD_OUT.values(), *POOLS["en"][:2], *POOLS["zh"][:2], "", "x"])]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = langid.score_lang(df, model).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.sql(langid.lang_scoring_sql(model)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert (got["lang_pred_model"] == want["lang_pred_model"]).all()
    for lang in model["langs"]:
        assert (got[f"prob_{lang}"] - want[f"prob_{lang}"]).abs().max() \
            <= 1e-6


def test_scoring_plan_one_exchange_no_join(spark, model):
    # codegen reformulation: explode gram indices, partial-agg per doc —
    # exactly one exchange (the per-doc aggregation), never a join
    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id long, text string")
    plan = langid.score_lang(df, model) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1 and "Join" not in plan
    # the per-GRAM path must be HOF-free (codegen); the only interpreted
    # lambda allowed is the per-DOC argmax fold over the C-element array
    pre_agg = plan.split("HashAggregate", 1)[-1]  # below the agg = gram side
    assert "lambdafunction" not in pre_agg.lower()
