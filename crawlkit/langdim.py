"""Language dimension: code normalization + RTL membership (J3/J4).

The reference normalizes free-form language names/codes against a
947-entry ISO-639 array by linear scan over four name forms
(`/root/reference/src/lang.ts:3-17`) and checks RTL membership against
an 8-code list (`src/lang.ts:19-32`).  The rebuild makes both a
broadcast dimension join / `isin` semi-join over a small dim table.

The table below is a representative ISO-639 subset assembled from
public ISO data (the dim is swappable for a full table; the operators
don't depend on its size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# (iso639_1, iso639_3, english_name, native_name)
LANGUAGES: list[tuple[str, str, str, str]] = [
    ("ar", "ara", "Arabic", "العربية"),
    ("bn", "ben", "Bengali", "বাংলা"),
    ("de", "deu", "German", "Deutsch"),
    ("el", "ell", "Greek", "Ελληνικά"),
    ("en", "eng", "English", "English"),
    ("es", "spa", "Spanish", "Español"),
    ("fa", "fas", "Persian", "فارسی"),
    ("fr", "fra", "French", "Français"),
    ("he", "heb", "Hebrew", "עברית"),
    ("hi", "hin", "Hindi", "हिन्दी"),
    ("id", "ind", "Indonesian", "Bahasa Indonesia"),
    ("it", "ita", "Italian", "Italiano"),
    ("ja", "jpn", "Japanese", "日本語"),
    ("ko", "kor", "Korean", "한국어"),
    ("nl", "nld", "Dutch", "Nederlands"),
    ("pl", "pol", "Polish", "Polski"),
    ("pt", "por", "Portuguese", "Português"),
    ("ru", "rus", "Russian", "Русский"),
    ("sw", "swa", "Swahili", "Kiswahili"),
    ("th", "tha", "Thai", "ไทย"),
    ("tr", "tur", "Turkish", "Türkçe"),
    ("uk", "ukr", "Ukrainian", "Українська"),
    ("ur", "urd", "Urdu", "اردو"),
    ("vi", "vie", "Vietnamese", "Tiếng Việt"),
    ("yi", "yid", "Yiddish", "ייִדיש"),
    ("zh", "zho", "Chinese", "中文"),
]

# reference rtlLanguageCodeList3 (src/lang.ts:19-27): 8 iso639-3 codes
RTL_CODES_3 = ("ara", "arc", "aze", "div", "fas", "heb", "urd", "yid")


def languages_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        LANGUAGES, "iso639_1 string, iso639_3 string, english string, native string"
    )


def normalize_lang(df: DataFrame, lang_col: str = "lang",
                   dim: DataFrame | None = None) -> DataFrame:
    """J3: match the input against any of the four name forms
    (lowercased, like the reference's linear scan) via a broadcast
    join; adds ``lang3`` (iso639-3, null when unmatched)."""
    spark = df.sparkSession
    dim = dim if dim is not None else languages_df(spark)
    forms = (
        dim.select(
            "iso639_3",
            F.explode(
                F.array(
                    F.lower("iso639_1"), F.lower("iso639_3"),
                    F.lower("english"), F.lower("native"),
                )
            ).alias("form"),
        )
        # deterministic winner if two languages ever share a form
        .groupBy("form")
        .agg(F.min("iso639_3").alias("iso639_3"))
    )
    return (
        df.withColumn("_form", F.lower(F.trim(F.col(lang_col))))
        .join(F.broadcast(forms), F.col("_form") == F.col("form"), "left")
        .withColumnRenamed("iso639_3", "lang3")
        .drop("_form", "form")
    )


def is_rtl(lang3: Column | str) -> Column:
    """J4 semi-join membership: 8-element list → ``isin`` (broadcast-
    free; the optimizer folds it to an InSet)."""
    col = F.col(lang3) if isinstance(lang3, str) else lang3
    return col.isin(*RTL_CODES_3)
