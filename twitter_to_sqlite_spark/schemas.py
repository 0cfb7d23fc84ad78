"""Explicit StructTypes for Twitter API v1.1 entities — no schema
inference in the hot path (SURVEY §1.2-1.3).

The reference lets sqlite_utils infer column types from the first row
seen, which produces TEXT-affinity quirks (SURVEY §1.2); we declare
LongType ids and typed nested structs instead, and note the divergence.

Tweet structs are recursive in the API (retweeted_status /
quoted_status nest a full tweet). Parquet/Spark schemas cannot be
recursive, so we declare the practical 2-level unroll: the API nests
at most one level in practice (a retweet of a quote carries both at
level 1; level-2 nesting is dropped by Twitter itself).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _indices():
    return T.ArrayType(T.IntegerType())


def entities_schema() -> T.StructType:
    url_entity = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("expanded_url", T.StringType()),
        T.StructField("display_url", T.StringType()),
        T.StructField("indices", _indices()),
    ])
    return T.StructType([
        T.StructField("hashtags", T.ArrayType(T.StructType([
            T.StructField("text", T.StringType()),
            T.StructField("indices", _indices()),
        ]))),
        T.StructField("symbols", T.ArrayType(T.StructType([
            T.StructField("text", T.StringType()),
            T.StructField("indices", _indices()),
        ]))),
        T.StructField("user_mentions", T.ArrayType(T.StructType([
            T.StructField("screen_name", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("id", T.LongType()),
            T.StructField("id_str", T.StringType()),
            T.StructField("indices", _indices()),
        ]))),
        T.StructField("urls", T.ArrayType(url_entity)),
    ])


def user_entities_schema() -> T.StructType:
    urls_holder = T.StructType([
        T.StructField("urls", T.ArrayType(T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("expanded_url", T.StringType()),
            T.StructField("display_url", T.StringType()),
            T.StructField("indices", _indices()),
        ]))),
    ])
    return T.StructType([
        T.StructField("url", urls_holder),
        T.StructField("description", urls_holder),
    ])


def user_schema() -> T.StructType:
    return T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("id_str", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("screen_name", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("entities", user_entities_schema()),
        T.StructField("protected", T.BooleanType()),
        T.StructField("followers_count", T.IntegerType()),
        T.StructField("friends_count", T.IntegerType()),
        T.StructField("listed_count", T.IntegerType()),
        T.StructField("favourites_count", T.IntegerType()),
        T.StructField("statuses_count", T.IntegerType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("time_zone", T.StringType()),
        T.StructField("geo_enabled", T.BooleanType()),
        T.StructField("verified", T.BooleanType()),
        T.StructField("lang", T.StringType()),
        T.StructField("profile_image_url_https", T.StringType()),
        T.StructField("profile_banner_url", T.StringType()),
        T.StructField("default_profile", T.BooleanType()),
        T.StructField("default_profile_image", T.BooleanType()),
        T.StructField("following", T.BooleanType()),
        T.StructField("follow_request_sent", T.BooleanType()),
        T.StructField("notifications", T.BooleanType()),
        T.StructField("translator_type", T.StringType()),
    ])


def place_schema() -> T.StructType:
    return T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("place_type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("country_code", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("contained_within", T.ArrayType(T.StringType())),
        T.StructField("bounding_box", T.StructType([
            T.StructField("type", T.StringType()),
            T.StructField("coordinates", T.ArrayType(
                T.ArrayType(T.ArrayType(T.DoubleType()))
            )),
        ])),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
    ])


def media_schema() -> T.StructType:
    size = T.StructType([
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("resize", T.StringType()),
    ])
    return T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("id_str", T.StringType()),
        T.StructField("indices", _indices()),
        T.StructField("media_url", T.StringType()),
        T.StructField("media_url_https", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("display_url", T.StringType()),
        T.StructField("expanded_url", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("sizes", T.MapType(T.StringType(), size)),
    ])


def _tweet_fields(nested: bool) -> list[T.StructField]:
    fields = [
        T.StructField("id", T.LongType()),
        T.StructField("id_str", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("full_text", T.StringType()),
        T.StructField("truncated", T.BooleanType()),
        T.StructField("display_text_range", _indices()),
        T.StructField("entities", entities_schema()),
        T.StructField("extended_entities", T.StructType([
            T.StructField("media", T.ArrayType(media_schema())),
        ])),
        T.StructField("source", T.StringType()),
        T.StructField("in_reply_to_status_id", T.LongType()),
        T.StructField("in_reply_to_user_id", T.LongType()),
        T.StructField("in_reply_to_screen_name", T.StringType()),
        T.StructField("user", user_schema()),
        T.StructField("geo", T.StringType()),
        T.StructField("coordinates", T.StringType()),
        T.StructField("contributors", T.StringType()),
        T.StructField("place", place_schema()),
        T.StructField("is_quote_status", T.BooleanType()),
        T.StructField("quoted_status_id", T.LongType()),
        T.StructField("quoted_status_id_str", T.StringType()),
        T.StructField("quoted_status_permalink", T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("expanded", T.StringType()),
            T.StructField("display", T.StringType()),
        ])),
        T.StructField("retweet_count", T.IntegerType()),
        T.StructField("favorite_count", T.IntegerType()),
        T.StructField("favorited", T.BooleanType()),
        T.StructField("retweeted", T.BooleanType()),
        T.StructField("possibly_sensitive", T.BooleanType()),
        T.StructField("lang", T.StringType()),
    ]
    if nested:
        inner = T.StructType(_tweet_fields(nested=False))
        fields.extend([
            T.StructField("retweeted_status", inner),
            T.StructField("quoted_status", inner),
        ])
    return fields


def tweet_schema() -> T.StructType:
    """Top-level tweet with 1 level of nested retweeted/quoted status
    (the API's practical maximum)."""
    return T.StructType(_tweet_fields(nested=True))


# Streaming-API extras: extended_tweet carries the full text when the
# 140-char `text` field is truncated (P7, utils.py:636-644).
def streaming_tweet_schema() -> T.StructType:
    base = _tweet_fields(nested=True)
    return T.StructType(base + [
        T.StructField("text", T.StringType()),
        T.StructField("extended_tweet", T.StructType([
            T.StructField("full_text", T.StringType()),
        ])),
        T.StructField("timestamp_ms", T.StringType()),
    ])


def list_schema() -> T.StructType:
    """A lists/ownerships row after lists_command's prep (user struct
    already replaced by the owner's id; id_str dropped) — the v1.1
    list object's documented fields. Declared so the lists path does
    no schema inference, same rule as tweets/users."""
    return T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("subscriber_count", T.IntegerType()),
        T.StructField("member_count", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("slug", T.StringType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("following", T.BooleanType()),
        T.StructField("user", T.LongType()),
    ])
