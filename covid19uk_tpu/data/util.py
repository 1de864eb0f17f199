"""Data-layer validators and LAD-code merging.

Port of the live parts of ``/root/reference/covid19uk/data/util.py``
(merge map ``util.py:40-49``, validators ``util.py:57-91``); the dead
filename helpers are intentionally not rebuilt (SURVEY.md §2.3).
"""

import re

import numpy as np
import pandas as pd

# Merged LADs become one combined location whose code is the comma-joined
# pair (reference data/util.py:40-49).
_MERGE_MAP = {
    "E06000052": "E06000052,E06000053",  # Cornwall & Isles of Scilly
    "E06000053": "E06000052,E06000053",
    "E09000001": "E09000001,E09000033",  # City of London & Westminster
    "E09000033": "E09000001,E09000033",
}


def merge_lad_codes(lad19cd):
    if isinstance(lad19cd, pd.Series):
        return lad19cd.apply(lambda x: _MERGE_MAP.get(x, x))
    return [_MERGE_MAP.get(x, x) for x in lad19cd]


def merge_lad_values(df):
    """Sums values over merged LAD codes (reference data/util.py:52-54)."""
    return df.groupby("lad19cd").sum().reset_index()


def get_date_low_high(config):
    """Parses the config date range into numpy datetimes."""
    return tuple(np.datetime64(x) for x in config["date_range"])


def check_date_format(df):
    df = df.reset_index()
    if (
        not pd.to_datetime(df["date"], format="%Y-%m-%d", errors="coerce")
        .notnull()
        .all()
    ):
        raise ValueError("Invalid date format")
    return True


def check_date_bounds(df, date_low, date_high):
    if not ((date_low <= df["date"]) & (df["date"] < date_high)).all():
        raise ValueError("Date out of bounds")
    return True


def check_lad19cd_format(df):
    """One region letter followed by 8 digits; merged comma-joined pairs of
    such codes also pass (reference data/util.py:82-92)."""
    df = df.reset_index()
    pattern = re.compile(r"^[ENSW]\d{8}(,[ENSW]\d{8})*$")
    ok = df["lad19cd"].astype(str).apply(lambda x: bool(pattern.match(x)))
    if not ok.all():
        raise ValueError("Invalid lad19cd format")
    return True


def invalid_input(value):
    raise NotImplementedError(f'Input type "{value}" mode not implemented')
