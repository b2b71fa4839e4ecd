"""Language-ID over the widened 14-language stopword set (r14 —
the Latin-script Snowball languages; textstats.STOPWORDS)."""

from __future__ import annotations

from muopdb_spark.operators.textstats import STOPWORDS, lang_id

SENTENCES = {
    "en": "the cat sat on the mat and it is a good day for the walk",
    "de": "der Hund ist mit den Kindern zu dem Park und das ist ein Spiel",
    "fr": "le chat est sur la table et les enfants du village sont la",
    "es": "el perro y los gatos en la casa es una historia de las aldeas",
    "pt": "o menino foi para casa com um livro e uma caneta para escrever mais",
    "it": "il ragazzo che corre per la strada con il cane del vicino ma anche si sono",
    "nl": "het huis van een man dat op de berg staat is niet te zien voor met",
    "sv": "och det har varit en dag som till av om den inte",
    "no": "og det var en dag som han ikke ville til av med den",
    "da": "og det var en dag som han ikke ville til af med den",
    "tr": "ve bu bir gun gibi daha sonra ne kadar ama icin",
    "fi": "ja se on oli mutta niin kun ei jos",
    "hu": "az hogy nem is egy van meg ez mar csak",
    "ro": "si sa nu este care pe cu mai dar dupa",
}


def test_all_fourteen_languages_identify(spark):
    rows = [(i, t) for i, t in enumerate(SENTENCES.values())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"]
           for r in lang_id(df).select("doc_id", "pred_lang").collect()}
    for i, want in enumerate(SENTENCES):
        assert got[i] == want, f"{want}: got {got[i]}"


def test_stopword_lists_are_ascii_lowercase():
    # the simple_tokens alphabet is [a-z0-9]; any non-ASCII stopword
    # could never match and would silently dilute its language's score
    for lang, words in STOPWORDS.items():
        assert len(words) >= 8, lang
        for w in words:
            assert w.isascii() and w == w.lower(), (lang, w)


def test_empty_and_numeric_text_is_und(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "12345 67890"), (2, "zzz qqq www")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"]
           for r in lang_id(df).select("doc_id", "pred_lang").collect()}
    assert got[0] == "und" and got[1] == "und" and got[2] == "und"


def test_script_id_twelve_scripts(spark):
    from muopdb_spark.operators.textstats import script_id

    rows = [
        (0, "plain latin text", "latin"),
        (1, "Привет мир это русский текст", "cyrillic"),
        (2, "Γειά σου κόσμε ελληνικά", "greek"),
        (3, "مرحبا بالعالم هذا نص عربي", "arabic"),
        (4, "שלום עולם זה טקסט", "hebrew"),
        (5, "你好世界这是中文文本", "han"),
        (6, "これはひらがなのテキストです", "hiragana"),
        (7, "カタカナ テキスト サンプル", "katakana"),
        (8, "카탈로그 한국어 텍스트", "hangul"),
        (9, "यह हिंदी में पाठ है", "devanagari"),
        (10, "นี่คือข้อความภาษาไทย", "thai"),
        (11, "இது தமிழ் உரை", "tamil"),
        (12, "12345 !!! ...", "und"),
        (13, "", "und"),
        (14, "mixte latin avec немного кириллицы и еще слов", "cyrillic"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["script"] for r in script_id(df).collect()}
    for i, _t, want in rows:
        assert got[i] == want, (i, want, got[i])


def test_script_id_plan_is_pure_jvm(spark):
    from muopdb_spark.operators.textstats import script_id

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = script_id(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


# ------------------------------------------------- t22 (r15):
# non-Latin lang-ID: native-script stopwords + kana/hangul ratios


def test_multiscript_ladder_branches(spark):
    from muopdb_spark.operators.textstats import lang_id_multiscript

    rows = [
        (0, "и в не на я что это", "ru"),
        (1, "και να το η ο με για", "el"),
        (2, "في من على أن هذا مع", "ar"),
        (3, "日本語のテキストです", "ja"),       # kana present -> ja
        (4, "한국어 텍스트 예제", "ko"),          # hangul -> ko
        (5, "中文文本样例测试", "zh"),             # bare han -> zh
        (6, "한국어로 작성된 글입니다 テスト", "ko"),  # hangul >= kana
        (7, "한국語テスト", "ja"),                 # kana > hangul -> ja
        (8, "plain ascii words only", "und"),     # latin routes to t3
        (9, "", "und"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["pred_lang"]
           for r in lang_id_multiscript(df).collect()}
    for i, _t, want in rows:
        assert got[i] == want, (i, want, got[i])


def test_multiscript_scores_and_tokenizer(spark):
    from muopdb_spark.operators.textstats import lang_id_multiscript

    # punctuation splits unicode tokens; digits are tokens; scores are
    # hits / n_tokens
    df = spark.createDataFrame(
        [(0, "и, в! не 42")], "doc_id long, text string"
    )
    r = lang_id_multiscript(df).collect()[0]
    assert r["pred_lang"] == "ru"
    assert r["score_ru"] == 0.75  # 3 hits / 4 tokens
    assert r["score_el"] == 0.0 and r["score_ar"] == 0.0


def test_multiscript_plan_is_pure_jvm(spark):
    from muopdb_spark.operators.textstats import lang_id_multiscript

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = lang_id_multiscript(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan


def test_t22_template_constants_match_operator(spark):
    """The t22 oracle is a hand table of per-template constants
    (__spark_entry__._T22_TEMPLATES); this pin recomputes every
    constant with the LIVE operator so the table cannot drift from
    the Java script classes or the stoplists."""
    from __spark_entry__ import _T22_TEMPLATES
    from muopdb_spark.operators.textstats import lang_id_multiscript

    df = spark.createDataFrame(
        [(i, t[0] + " 7") for i, t in enumerate(_T22_TEMPLATES)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lang_id_multiscript(df).collect()}
    for i, (_txt, pred, n_toks, ru, el, ar, kana, hangul, han) \
            in enumerate(_T22_TEMPLATES):
        r = got[i]
        assert r["pred_lang"] == pred, i
        assert r["kana_chars"] == kana, i
        assert r["hangul_chars"] == hangul, i
        assert r["han_chars"] == han, i
        assert r["score_ru"] == round(ru / (n_toks + 1), 6), i
        assert r["score_el"] == round(el / (n_toks + 1), 6), i
        assert r["score_ar"] == round(ar / (n_toks + 1), 6), i


# ------------------------------------------------- t23 (r15):
# the full routed dispatch (script -> t3 latin / t22 non-latin)


def test_routed_dispatch_all_branches(spark):
    from muopdb_spark.operators.textstats import lang_id_routed

    rows = [
        (0, "the cat and the dog of it", "latin", "en"),
        (1, "der hund und die katze ist von", "latin", "de"),
        (2, "mountain river stone", "latin", "und"),  # no stopwords
        (3, "и в не на я что", "cyrillic", "ru"),
        (4, "في من على أن", "arabic", "ar"),
        (5, "日本語のテキストです", "katakana", "ja"),
        (6, "한국어 텍스트 예제", "hangul", "ko"),
        (7, "中文文本样例", "han", "zh"),
        (8, "!!! ???", "und", "und"),
        (9, "", "und", "und"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["script"], r["pred_lang"])
           for r in lang_id_routed(df).collect()}
    for i, _t, sc, pred in rows:
        assert got[i] == (sc, pred), (i, got[i], sc, pred)


def test_routed_plan_single_scan_pure_jvm(spark):
    from muopdb_spark.operators.textstats import lang_id_routed

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = lang_id_routed(df) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEval" not in plan
    # one scan, no joins/exchanges — the dispatch is a map pass
    assert "Join" not in plan and "Exchange" not in plan


def test_t23_template_constants_match_operators(spark):
    """The t23 oracle's script/non-latin arms are hand constants and
    its latin arms come from a Python replica of lang_id's scoring;
    recompute everything with the LIVE operator."""
    from __spark_entry__ import _T23_TEMPLATES, _t23_latin_pred
    from muopdb_spark.operators.textstats import lang_id_routed

    df = spark.createDataFrame(
        [(i, t[0] + " 7") for i, t in enumerate(_T23_TEMPLATES)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in lang_id_routed(df).collect()}
    for i, (text, script) in enumerate(_T23_TEMPLATES):
        assert got[i]["script"] == script, i
        if script == "latin":
            assert got[i]["pred_lang"] == _t23_latin_pred(text + " 7"), i


def test_stray_cjk_char_does_not_override_dominant_script(spark):
    """r15 review fix: the CJK ladder only applies when CJK is the
    dominant letter mass (multiscript) / the dominant script (routed)
    — one stray han or hangul char in a Russian/Arabic/English page
    must not yield zh/ko."""
    from muopdb_spark.operators.textstats import (
        lang_id_multiscript,
        lang_id_routed,
    )

    rows = [
        (0, "и в не на я что это 汉", "ru"),
        (1, "في من على أن هذا مع 한", "ar"),
        (2, "plain english words entirely 汉", "und"),  # latin mass
        (3, "中文文本样例测试 x", "zh"),               # CJK still dominant
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["pred_lang"]
           for r in lang_id_multiscript(df).collect()}
    for i, _t, want in rows:
        assert got[i] == want, ("multiscript", i, got[i], want)
    routed = {r["doc_id"]: (r["script"], r["pred_lang"])
              for r in lang_id_routed(df).collect()}
    assert routed[0] == ("cyrillic", "ru")
    assert routed[1] == ("arabic", "ar")
    assert routed[2] == ("latin", "und")
    assert routed[3] == ("han", "zh")
