from .arrays import array_last, date_spine, ordered_collect, sorted_collect_set
from .datelist import (
    datelist_int,
    datelist_probe_month,
    datelist_probe_week,
    epoch_day,
    utc_date,
    utc_date_of_ts,
    utc_ts_str,
)
from .text import (
    channel_from_referrer,
    doc_fingerprint,
    lang_id_heuristic,
    quality_score,
    token_count,
    tokens,
)

__all__ = [
    "array_last",
    "date_spine",
    "ordered_collect",
    "sorted_collect_set",
    "datelist_int",
    "datelist_probe_month",
    "datelist_probe_week",
    "epoch_day",
    "utc_date",
    "utc_date_of_ts",
    "utc_ts_str",
    "channel_from_referrer",
    "doc_fingerprint",
    "lang_id_heuristic",
    "quality_score",
    "token_count",
    "tokens",
]
