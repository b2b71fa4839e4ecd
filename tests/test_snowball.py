"""Snowball stemmer conformance + multilingual pipeline tests.

The de/es/fr stemmers implement the published Snowball algorithm
descriptions (snowballstem.org); the vectors below pin inflection-family
collapses and known outputs so any refactor that changes behavior is
caught (and the contract oracles, which embed a literal token->stem map
over the fixture vocabulary, stay in sync with the stemmers).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from muopdb_spark.functions.snowball import french_stem, german_stem, spanish_stem
from muopdb_spark.functions.text import (
    stem_word,
    stemmed_tokens,
    stemmed_tokens_by_lang,
)

# Fixture vocabulary (all sf dirs share it); the contract oracles for the
# stemmed queries embed stem classes computed over this list, so it must
# stay a superset of the real fixture tokens — test_vocab_guard pins that.
DOC_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]


@pytest.mark.parametrize("word,stem", [
    ("aufeinander", "aufeinand"),
    ("abhängen", "abhang"),
    ("bücher", "buch"),
    ("häuser", "haus"),
    ("arbeiten", "arbeit"),
    ("freundlichkeit", "freundlich"),
    ("kategorie", "kategori"),
    ("verständnisse", "verstandnis"),
    ("sprechen", "sprech"),
])
def test_german_vectors(word, stem):
    assert german_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("corriendo", "corr"),
    ("gatos", "gat"),
    ("nacionales", "nacional"),
    ("naciones", "nacion"),
    ("fácilmente", "facil"),
    ("rápidamente", "rapid"),
    ("trabajadores", "trabaj"),
    ("comunicación", "comun"),
    ("lógicas", "logic"),
])
def test_spanish_vectors(word, stem):
    assert spanish_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("continuellement", "continuel"),
    ("majestueusement", "majestu"),
    ("majestueux", "majestu"),
    ("nationale", "national"),
    ("mangeraient", "mang"),
    ("communication", "commun"),
    ("abondamment", "abond"),
    ("facilement", "facil"),
])
def test_french_vectors(word, stem):
    assert french_stem(word) == stem


@pytest.mark.parametrize("fn,family", [
    (german_stem, ["abhängen", "abhängig", "abhängigkeit"]),
    (spanish_stem, ["corriendo", "correr", "corre"]),
    (spanish_stem, ["trabajando", "trabajar", "trabajadores"]),
    (french_stem, ["mangeraient", "manger", "mangeant"]),
    (french_stem, ["logique", "logiques"]),
])
def test_inflection_family_collapse(fn, family):
    stems = {fn(w) for w in family}
    assert len(stems) == 1, stems


def test_stem_word_dispatch():
    assert stem_word("running", "en") == "run"
    assert stem_word("filters", "de") == "filt"
    assert stem_word("gatos", "es") == "gat"
    assert stem_word("nationale", "fr") == "national"
    # unsupported language degrades to lowercase identity
    assert stem_word("Running", "zh") == "running"


def test_vocab_guard():
    """Fixture tokens must stay within DOC_VOCAB at every sf the driver
    touches — the stemmed-Contains oracles embed stem classes computed
    over this list."""
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        toks = {
            r[0]
            for r in con.execute(
                "select distinct unnest(string_split_regex(lower(text), '\\s+'))"
                f" from read_parquet('/root/testdata/{sf}/documents.parquet')"
            ).fetchall()
            if r[0]
        }
        assert toks <= set(DOC_VOCAB), toks - set(DOC_VOCAB)


def test_stemmed_tokens_fixed_language(spark):
    df = spark.createDataFrame(
        [(1, "Filters orders merge"), (2, "fast scan")], "id long, text string"
    )
    rows = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", stemmed_tokens("text", "de").alias("toks")
        ).collect()
    }
    assert rows[1] == ["filt", "ord", "merg"]
    assert rows[2] == ["fast", "scan"]


def test_stemmed_tokens_by_lang(spark):
    df = spark.createDataFrame(
        [
            (1, "de", "filters orders"),
            (2, "en", "running connections"),
            (3, "es", "gatos corriendo"),
            (4, "fr", "logiques nationale"),
            (5, "zh", "Filters Orders"),
            (6, None, "filters"),
        ],
        "id long, lang string, text string",
    )
    rows = {
        r["id"]: r["toks"]
        for r in df.select(
            "id", stemmed_tokens_by_lang("text", "lang").alias("toks")
        ).collect()
    }
    assert rows[1] == ["filt", "ord"]
    assert rows[2] == ["run", "connect"]
    assert rows[3] == ["gat", "corr"]
    assert rows[4] == ["logiqu", "national"]
    assert rows[5] == ["filters", "orders"]  # identity fallback
    assert rows[6] == ["filters"]  # null language -> identity


def test_german_contains_filter(spark):
    """Contains with a German-language TEXT field: the query value is
    stemmed with the same stemmer as the index side, so 'filters'
    matches documents containing 'filter' (query-time inflection)."""
    from muopdb_spark.filters.compiler import FilterSchema, compile_filter

    df = spark.createDataFrame(
        [(1, "der filter läuft"), (2, "order scan"), (3, "filter order")],
        "doc_id long, text string",
    ).withColumn("text_tokens", stemmed_tokens("text", "de"))
    schema = FilterSchema({"text": ("text", "de")})
    cond = compile_filter(
        {"contains": {"path": "text", "value": "filters orders"}},
        schema, id_col="doc_id",
    )
    got = sorted(r["doc_id"] for r in df.filter(cond).collect())
    assert got == [3]


def test_term_index_language_spec(spark):
    from muopdb_spark.index.terms import build_term_index

    df = spark.createDataFrame(
        [(1, "filters orders"), (2, "filter merge")], "doc_id long, text string"
    )
    idx = build_term_index(df, {"text": ("text", "de")}, id_col="doc_id")
    terms = {r["term"]: r["postings"] for r in idx.collect()}
    assert terms["filt"] == [1, 2]
    assert terms["ord"] == [1]
    assert terms["merg"] == [2]


# ------------------------------------------------- Portuguese / Italian


@pytest.mark.parametrize("word,stem", [
    ("gostou", "gost"),
    ("gostaria", "gost"),
    ("gostando", "gost"),
    ("meninas", "menin"),
    ("menino", "menin"),
    ("amoroso", "amor"),
    ("amorosa", "amor"),
    ("associação", "assoc"),
    ("associações", "assoc"),
    ("nacionalidade", "nacional"),
    ("possibilidade", "possibil"),
    ("rapidamente", "rapid"),
    ("bonitas", "bonit"),
])
def test_portuguese_vectors(word, stem):
    from muopdb_spark.functions.snowball import portuguese_stem

    assert portuguese_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("guardare", "guard"),
    ("guardarli", "guard"),        # step-0 pronoun (spec example)
    ("abbandonata", "abbandon"),
    ("abbandonati", "abbandon"),
    ("cantavano", "cant"),
    ("cantando", "cant"),
    ("felicità", "felic"),
    ("nazionale", "nazional"),
    ("nazionali", "nazional"),
    ("organizzazione", "organizz"),
    ("possibilità", "possibil"),
    ("pronuncia", "pronunc"),      # step-3a i-after-vowel (crocchio rule)
])
def test_italian_vectors(word, stem):
    from muopdb_spark.functions.snowball import italian_stem

    assert italian_stem(word) == stem


def test_pt_it_family_collapse():
    """Inflection families collapse to one stem — the property Contains
    filters rely on (same stem on index and query side)."""
    from muopdb_spark.functions.snowball import italian_stem, portuguese_stem

    for fam in (["cantando", "cantava", "cantavas", "cantar", "cantaria"],
                ["bonita", "bonitas", "bonito", "bonitos"]):
        assert len({portuguese_stem(w) for w in fam}) == 1, fam
    for fam in (["cantare", "cantavano", "cantando", "cantata", "cantate"],
                ["abbandonata", "abbandonate", "abbandonati", "abbandonato"]):
        assert len({italian_stem(w) for w in fam}) == 1, fam


def test_pt_it_in_lang_dispatch(spark):
    """stemmed_tokens_by_lang picks up pt/it rows (no identity fallback)."""
    df = spark.createDataFrame(
        [(1, "meninas bonitas", "pt"), (2, "abbandonati cantavano", "it")],
        "doc_id long, text string, lang string",
    )
    rows = {
        r.doc_id: r.toks
        for r in df.select(
            "doc_id",
            stemmed_tokens_by_lang(F.col("text"), F.col("lang")).alias("toks"),
        ).collect()
    }
    assert rows[1] == ["menin", "bonit"]
    assert rows[2] == ["abbandon", "cant"]


# -------------------------------------- Scandinavian + Dutch (sv/no/da/nl)


@pytest.mark.parametrize("word,stem", [
    ("jackor", "jack"),
    ("klockor", "klock"),
    ("stockholmare", "stockholm"),
    ("snabbaste", "snabb"),
    ("snabbare", "snabb"),
    ("vänligt", "vän"),          # step2 gt-undouble then step3 lig
])
def test_swedish_vectors(word, stem):
    from muopdb_spark.functions.snowball import swedish_stem

    assert swedish_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("hustruer", "hustru"),
    ("hustruene", "hustru"),
    ("viktigste", "viktigst"),
    ("naturlige", "natur"),
    ("naturlig", "natur"),
    ("forsker", "forsk"),
])
def test_norwegian_vectors(word, stem):
    from muopdb_spark.functions.snowball import norwegian_stem

    assert norwegian_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("undersøgelse", "undersøg"),
    ("undersøgelsen", "undersøg"),
    ("mulighederne", "mulighed"),
    ("hurtigste", "hurt"),       # igst -> ig -> (step3b ig)
    ("venlige", "ven"),
    ("venlig", "ven"),
])
def test_danish_vectors(word, stem):
    from muopdb_spark.functions.snowball import danish_stem

    assert danish_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("lichamelijk", "licham"),
    ("lichamelijke", "licham"),
    ("mogelijkheden", "mogelijk"),   # heden->heid, heid dropped in R2
    ("mogelijkheid", "mogelijk"),
    ("gekken", "gek"),               # en-drop + kk undouble
    ("huizen", "huiz"),
    ("lopen", "lop"),
])
def test_dutch_vectors(word, stem):
    from muopdb_spark.functions.snowball import dutch_stem

    assert dutch_stem(word) == stem


def test_nordic_dutch_family_collapse():
    from muopdb_spark.functions.snowball import (
        danish_stem, dutch_stem, norwegian_stem, swedish_stem,
    )

    assert len({swedish_stem(w) for w in ["klockor", "klocka", "klockas"]}) == 1
    assert len({norwegian_stem(w) for w in ["hustruer", "hustruene", "hustrua"]}) == 1
    assert len({danish_stem(w) for w in ["venlig", "venlige", "venligst"]}) == 1
    assert len({dutch_stem(w) for w in ["lichamelijk", "lichamelijke"]}) == 1


def test_nine_language_dispatch(spark):
    """All nine Snowball languages + English resolve through the
    registry (no identity fallback for the covered set)."""
    from muopdb_spark.functions.snowball import SNOWBALL_STEMMERS

    for code in ("de", "es", "fr", "pt", "it", "sv", "no", "da", "nl"):
        assert code in SNOWBALL_STEMMERS
    rows = spark.createDataFrame(
        [(1, "klockor", "sv"), (2, "hustruene", "no"),
         (3, "venlige", "da"), (4, "gekken", "nl")],
        "doc_id long, text string, lang string",
    ).select(
        "doc_id",
        stemmed_tokens_by_lang(F.col("text"), F.col("lang")).alias("toks"),
    ).collect()
    got = {r.doc_id: r.toks for r in rows}
    assert got == {1: ["klock"], 2: ["hustru"], 3: ["ven"], 4: ["gek"]}


# ------------------------------------------------------ Russian / Turkish

@pytest.mark.parametrize("word,stem", [
    # noun declensions collapse with their nominative
    ("вагона", "вагон"), ("вагоном", "вагон"), ("вагонов", "вагон"),
    ("вагон", "вагон"),
    ("книга", "книг"), ("книги", "книг"), ("книгами", "книг"),
    ("книгу", "книг"),
    # adjectives: gender/number/case endings removed
    ("красивый", "красив"), ("красивая", "красив"),
    ("красивые", "красив"), ("красивым", "красив"),
    # verbs: group-1 endings require the preceding а/я (kept)
    ("читала", "чита"), ("читали", "чита"), ("читать", "чита"),
    # superlative ейш removed after the adjective ending (step 4)
    ("быстрый", "быстр"), ("быстрейший", "быстр"),
    # reflexive + perfective-gerund path
    ("делавшись", "дела"),
    # ё normalizes to е before stemming
    ("ёлка", "елк"),
])
def test_russian_vectors(word, stem):
    from muopdb_spark.functions.snowball import russian_stem

    assert russian_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    # plural / ablative / accusative all reach the devoiced nominative
    ("kitaplar", "kitap"), ("kitaplardan", "kitap"),
    ("kitabı", "kitap"), ("kitap", "kitap"),
    # possessive chains: (s)U, nDAn, (U)mUz (+lAr)
    ("arabası", "araba"), ("arabasından", "araba"),
    ("arabalarımız", "araba"), ("arabamız", "araba"),
    # ki-chain: evdeki -> evde -> ev
    ("evdeki", "ev"), ("evdekiler", "ev"), ("evinizde", "ev"),
    ("evde", "ev"), ("ev", "ev"),
    # nominal verb suffixes: DUr, sUnUz, (y)mUş, (y)Um, (y)DU
    ("güzeldir", "güzel"), ("güzelsiniz", "güzel"),
    ("gelmiş", "gel"), ("geliyorum", "geliyor"),
    ("elmalardı", "elma"),
    # single-syllable words are never stripped
    ("at", "at"),
])
def test_turkish_vectors(word, stem):
    from muopdb_spark.functions.snowball import turkish_stem

    assert turkish_stem(word) == stem


def test_ru_tr_family_collapse_and_dispatch(spark):
    from muopdb_spark.functions.snowball import (
        SNOWBALL_STEMMERS, russian_stem, turkish_stem,
    )

    assert "ru" in SNOWBALL_STEMMERS and "tr" in SNOWBALL_STEMMERS
    assert len({russian_stem(w) for w in
                ["вагона", "вагоном", "вагонов", "вагон"]}) == 1
    assert len({turkish_stem(w) for w in
                ["kitaplar", "kitaplardan", "kitabı", "kitap"]}) == 1
    rows = spark.createDataFrame(
        [(1, "книгами", "ru"), (2, "kitaplardan", "tr")],
        "doc_id long, text string, lang string",
    ).select(
        "doc_id",
        stemmed_tokens_by_lang(F.col("text"), F.col("lang")).alias("toks"),
    ).collect()
    got = {r.doc_id: r.toks for r in rows}
    assert got == {1: ["книг"], 2: ["kitap"]}


# ----------------------------------- remaining reference languages (r4)

@pytest.mark.parametrize("word,stem", [
    ("român", "român"), ("română", "român"), ("români", "român"),
    ("românilor", "român"), ("românesc", "român"),
    ("lucrare", "lucr"), ("lucrarea", "lucr"),
    ("cântând", "cânt"), ("cântam", "cânt"),
    ("abilitate", "abil"), ("copilului", "copil"),
])
def test_romanian_vectors(word, stem):
    from muopdb_spark.functions.snowball import romanian_stem

    assert romanian_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("ház", "ház"), ("házak", "ház"), ("házat", "ház"), ("házban", "ház"),
    ("házakat", "ház"), ("háza", "ház"), ("házaim", "ház"),
    ("könyv", "könyv"), ("könyvek", "könyv"), ("könyvvel", "könyv"),
    ("könyveink", "könyv"),
    ("asztal", "asztal"), ("asztalon", "asztal"),
    ("emberek", "ember"),
])
def test_hungarian_vectors(word, stem):
    from muopdb_spark.functions.snowball import hungarian_stem

    assert hungarian_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("talo", "talo"), ("talon", "talo"), ("talossa", "talo"),
    ("talosta", "talo"), ("taloon", "talo"), ("talot", "talo"),
    ("taloja", "talo"),
    ("kirja", "kirja"), ("kirjan", "kirja"), ("kirjassa", "kirja"),
    ("kirjat", "kirja"),
    ("autoon", "auto"), ("autot", "auto"),
])
def test_finnish_vectors(word, stem):
    from muopdb_spark.functions.snowball import finnish_stem

    assert finnish_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("λόγος", "λογ"), ("λόγου", "λογ"), ("λόγους", "λογ"),
    ("λόγων", "λογ"), ("λόγοι", "λογ"),
    ("γλώσσα", "γλωσσ"), ("γλώσσας", "γλωσσ"), ("γλώσσες", "γλωσσ"),
    ("γλωσσών", "γλωσσ"),
    ("γράφω", "γραφ"), ("γράφεις", "γραφ"), ("γράφει", "γραφ"),
])
def test_greek_vectors(word, stem):
    from muopdb_spark.functions.snowball import greek_stem

    assert greek_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("كتاب", "كتاب"), ("الكتاب", "كتاب"), ("كتابه", "كتاب"),
    ("وكتاب", "كتاب"),
    ("مسلم", "مسلم"), ("مسلمون", "مسلم"), ("مسلمين", "مسلم"),
    ("المسلمون", "مسلم"),
])
def test_arabic_vectors(word, stem):
    from muopdb_spark.functions.snowball import arabic_stem

    assert arabic_stem(word) == stem


@pytest.mark.parametrize("word,stem", [
    ("புத்தகம்", "புத்தகம்"), ("புத்தகங்கள்", "புத்தகம்"),
    ("வீடு", "வீடு"), ("வீடுகள்", "வீடு"), ("வீடும்", "வீடு"),
    ("அவன்", "அவன்"), ("அவனை", "அவன்"), ("அவனால்", "அவன்"),
    ("அவனும்", "அவன்"),
])
def test_tamil_vectors(word, stem):
    from muopdb_spark.functions.snowball import tamil_stem

    assert tamil_stem(word) == stem


def test_full_reference_language_dispatch():
    """Every language of stemming_tokenizer.rs:22-44 resolves to a real
    stemmer — the identity fallback is gone for the reference set
    (Vietnamese routes to English, as in the reference)."""
    from muopdb_spark.functions.text import _stemmer_for, porter_stem

    for code in ("ar", "da", "nl", "en", "fi", "fr", "de", "el", "hu",
                 "it", "no", "pt", "ro", "ru", "es", "sv", "ta", "tr",
                 "vi"):
        assert _stemmer_for(code) is not None, code
    assert _stemmer_for("vi") is porter_stem
    # unsupported tags still degrade to identity, not an error
    assert _stemmer_for("zz") is None


@pytest.mark.parametrize("lang,word,ours,published", [
    # Greek: the published Snowball Greek stemmer resolves step-1
    # exception entries (φαγιά -> φα, σκουλήκια -> σκουληκ); our reduced
    # rendition omits the exception tables, so these retain a final
    # vowel. Index and query share the function, so Contains semantics
    # are self-consistent.
    ("el", "φαγιά", "φαγι", "φα"),
    ("el", "σκουλήκια", "σκουληκι", "σκουληκ"),
    # Arabic: the published algorithm's verb-form tables conjoin
    # prefixed imperfect forms to the root (كتب); our reduced rendition
    # strips affixes positionally only.
    ("ar", "فسيكتبونها", "فسيكتب", "كتب"),
    # Tamil: the published pipeline ends with root extraction; ours
    # stops at suffix stripping, so inflected verbs keep their tense
    # marker.
    ("ta", "படித்தான்", "படித்தான்", "படி"),
    # Hungarian: we iterate the published single-pass algorithm to a
    # fixpoint, which over-strips noun stems the single pass leaves
    # intact (published: barát).
    ("hu", "barátok", "bar", "barát"),
    ("hu", "barátaim", "bar", "barát"),
])
def test_known_deviations_from_published_snowball(lang, word, ours, published):
    """KNOWN-DEVIATION pins (advisor r4): these inputs stem differently
    from the published Snowball / rust-stemmers output. The pins make
    the divergence explicit and catch accidental drift in either
    direction; `published` documents what reference-exact behavior
    would return (asserted different, not equal)."""
    from muopdb_spark.functions.text import stem_word

    got = stem_word(word, lang)
    assert got == ours
    assert got != published
