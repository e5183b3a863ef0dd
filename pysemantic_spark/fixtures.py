"""Deterministic synthetic fixtures + pure-pandas oracle (FIXTURES.md).

Everything is seeded numpy — no wall clock, no external data. The oracle is
an independent pandas re-statement of the reference clean() pipeline
(pysemantic/validator.py :: SeriesValidator/DataFrameValidator semantics),
used ONLY in tests to verify the Spark engine row-for-row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pysemantic_spark.spec import DatasetSpec

SEED = 42
BASE_TS = np.datetime64("2026-01-01T00:00:00", "us")
ROLES = np.array(["user", "assistant", "tool", "system"])
ROLE_P = np.array([0.40, 0.40, 0.15, 0.05])
TOOL_NAMES = [f"tool_{k:03d}" for k in range(50)] + [
    "search", "bash", "read_file", "write_file", "browser", "python",
]
_VOCAB = (
    "the quick brown fox jumps over lazy dog while spark validates every "
    "turn of a conversation with deterministic seeded tokens for byte exact "
    "reproducibility across runs and partitions at any scale factor "
).split()
_CORPUS = " ".join(_VOCAB * 40)  # ~10k chars to slice windows from


def write_transcripts_parquet(
    path: str,
    n_rows: int,
    seed: int = SEED,
    skew_conv_frac: float = 0.0,
    chunk_rows: int = 2_000_000,
) -> int:
    """Write a large transcripts table directly with pyarrow (no Spark, no
    driver-memory spike): one parquet file per chunk, each chunk generated
    with an independent derived seed. Returns total rows written."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    total = 0
    i = 0
    while total < n_rows:
        take = min(chunk_rows, n_rows - total)
        pdf = transcripts_pdf(
            n_rows=take,
            seed=seed + i,
            skew_conv_frac=skew_conv_frac if i == 0 else 0.0,
        )
        # disambiguate conv_ids across chunks while preserving the
        # ^c[0-9]{8}$ shape (injected bad-ids stay untouched)
        if i > 0:
            ok = pdf["conv_id"].str.match(r"^c[0-9]{8}$")
            nums = pdf.loc[ok, "conv_id"].str[1:].astype(int) + i * 3_000_000
            pdf.loc[ok, "conv_id"] = "c" + nums.astype(str).str.zfill(8)
        # Spark cannot read TIMESTAMP(NANOS) parquet — force microseconds
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        # small row groups so Spark can SPLIT the scan: parquet scans
        # parallelize at row-group granularity, and pyarrow's default
        # (1M rows/group) made a 2M-row table a 2-task scan on a 32-core
        # host — the whole validation pass ran at 1/16 of the machine
        # (round-7; guide §2.5 "input skew: one huge unsplittable file").
        # 62.5k rows ≈ 2 MB groups: fine-grained enough for any local
        # core count, far above the small-file floor.
        pq.write_table(
            table,
            os.path.join(path, f"part-{i:04d}.parquet"),
            row_group_size=62_500,
        )
        total += len(pdf)
        i += 1
    return total


def dim_tools_pdf() -> pd.DataFrame:
    cats = ["io", "web", "code", "math"]
    return pd.DataFrame(
        {
            "tool_name": TOOL_NAMES,
            "category": [cats[i % 4] for i in range(len(TOOL_NAMES))],
        }
    )


def transcripts_pdf(
    n_rows: int = 10_000,
    seed: int = SEED,
    inject_violations: bool = True,
    skew_conv_frac: float = 0.0,
) -> pd.DataFrame:
    """F1 transcripts table. ``skew_conv_frac`` > 0 adds one conversation
    holding that fraction of all rows (salting stress fixture)."""
    rng = np.random.default_rng(seed)

    # conversation sizes: 90% small, 9% medium, 1% long (Zipf-like)
    sizes: list[int] = []
    total = 0
    skew_rows = int(n_rows * skew_conv_frac)
    while total < n_rows - skew_rows:
        u = rng.random()
        if u < 0.90:
            s = int(rng.integers(2, 21))
        elif u < 0.99:
            s = int(rng.integers(21, 201))
        else:
            s = int(rng.integers(201, 5001))
        sizes.append(s)
        total += s
    if skew_rows > 0:
        sizes.append(skew_rows)

    n_convs = len(sizes)
    sizes_arr = np.array(sizes, dtype=np.int64)
    conv_ids_u = np.array([f"c{i:08d}" for i in range(n_convs)])
    conv_id = np.repeat(conv_ids_u, sizes_arr)
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes_arr])
    n = len(conv_id)

    role = ROLES[rng.choice(len(ROLES), size=n, p=ROLE_P)]
    tool = np.where(
        role == "tool",
        np.array(TOOL_NAMES)[rng.integers(0, len(TOOL_NAMES), size=n)],
        None,
    )

    # ts: strictly increasing within conv
    conv_offset_s = np.repeat(rng.integers(0, 10_000_000, size=n_convs), sizes_arr)
    step_s = np.repeat(rng.integers(1, 61, size=n_convs), sizes_arr)
    ts = BASE_TS + (conv_offset_s + turn_idx.astype(np.int64) * step_s).astype(
        "timedelta64[s]"
    ).astype("timedelta64[us]")

    # text: deterministic prefix + corpus window, len 10..500
    lengths = rng.integers(10, 501, size=n)
    offsets = rng.integers(0, len(_CORPUS) - 501, size=n)
    text = np.array(
        [
            f"turn {t} of {c}: {_CORPUS[o:o + L]}"
            for t, c, o, L in zip(turn_idx, conv_id, offsets, lengths)
        ],
        dtype=object,
    )

    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": pd.array(turn_idx, dtype="int32"),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )

    if not inject_violations:
        return pdf

    # --- violation injection: disjoint row sets, seeded (FIXTURES.md) -----
    idx = rng.permutation(n)
    cursor = 0

    def take(rate: float) -> np.ndarray:
        nonlocal cursor
        k = max(1, int(n * rate))
        out = idx[cursor:cursor + k]
        cursor += k
        return out

    pdf.loc[take(0.005), "text"] = None
    pdf.loc[take(0.005), "ts"] = pd.NaT
    neg = take(0.003)
    pdf.loc[neg, "turn_idx"] = -pdf.loc[neg, "turn_idx"].astype("int32") - 1
    pdf.loc[take(0.002), "ts"] = pd.Timestamp("2019-06-15 12:00:00")
    bad_ids = take(0.002)
    pdf.loc[bad_ids, "conv_id"] = [f"bad-id-{i}" for i in range(len(bad_ids))]
    pdf.loc[take(0.003), "role"] = "robot"
    pdf.loc[take(0.003), "tool"] = "ghost_tool"

    # uniqueness: duplicate (conv_id, turn_idx) pairs — half same text,
    # half differing text variants
    dup_src = idx[cursor:cursor + max(2, int(n * 0.004))]
    dup_rows = pdf.loc[dup_src].copy()
    half = len(dup_rows) // 2
    dup_rows.iloc[half:, dup_rows.columns.get_loc("text")] = (
        dup_rows.iloc[half:]["text"].astype(str) + " [dup-variant]"
    )
    dup_rows["ts"] = dup_rows["ts"] + pd.Timedelta(seconds=1)
    pdf = pd.concat([pdf, dup_rows], ignore_index=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def transcripts_spec() -> DatasetSpec:
    """F5 specs/transcripts.yaml as an in-code spec (the YAML file mirrors
    this; test_spec.py asserts they compile identically)."""
    return DatasetSpec.from_dict(
        "transcripts",
        {
            "dtypes": {
                "conv_id": "str", "turn_idx": "int", "role": "str",
                "text": "str", "tool": "str", "ts": "datetime",
            },
            "column_rules": {
                "text": {"is_drop_na": True},
                "ts": {"is_drop_na": True, "min": "2020-01-01 00:00:00"},
                "turn_idx": {"min": 0, "max": 100000},
                "conv_id": {"regex": "^c[0-9]{8}$"},
                "role": {"unique_values": ["system", "user", "assistant", "tool"]},
                "tool": {"reference": {"table": "dim_tools", "column": "tool_name"}},
            },
            "uniqueness": [["conv_id", "turn_idx"]],
            "order_by": ["ts"],
        },
    )


# ---------------------------------------------------------------------------
# F3 / F4 — reference test-suite parity fixtures
# ---------------------------------------------------------------------------

def flowers_pdf(seed: int = SEED) -> pd.DataFrame:
    """Iris-analog (reference tests/testdata/iris.csv shape)."""
    rng = np.random.default_rng(seed)
    species = np.repeat(["setosa", "versicolor", "virginica"], 50)
    means = {"setosa": 5.0, "versicolor": 5.9, "virginica": 6.6}
    mu = np.array([means[s] for s in species])
    return pd.DataFrame(
        {
            "sepal_length": np.clip(rng.normal(mu, 0.4), 0.1, 10.0).round(2),
            "sepal_width": np.clip(rng.normal(3.0, 0.4, 150), 0.1, 10.0).round(2),
            "petal_length": np.clip(rng.normal(mu - 2.0, 0.5), 0.1, 10.0).round(2),
            "petal_width": np.clip(rng.normal(1.2, 0.5, 150), 0.1, 10.0).round(2),
            "species": species,
        }
    )


def activity_pdf(n: int = 1000, seed: int = SEED) -> pd.DataFrame:
    """person_activity-analog (datetime + categorical groups)."""
    rng = np.random.default_rng(seed)
    seqs = np.array(["A01", "B02", "C03", "D04", "E05"])
    acts = np.array(
        ["walking", "falling", "sitting", "standing", "lying", "on_all_fours", "other"]
    )
    return pd.DataFrame(
        {
            "sequence_name": seqs[rng.integers(0, 5, n)],
            "tag": np.array(["t1", "t2", "t3", "t4"])[rng.integers(0, 4, n)],
            "date": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000_000, n), unit="s"),
            "x": rng.random(n).round(6),
            "y": rng.random(n).round(6),
            "z": rng.random(n).round(6),
            "activity": acts[rng.integers(0, 7, n)],
        }
    )


# ---------------------------------------------------------------------------
# Pandas oracle — independent re-statement of reference clean() semantics
# ---------------------------------------------------------------------------

def pandas_oracle(
    pdf: pd.DataFrame, spec: DatasetSpec, dims: dict[str, pd.DataFrame]
) -> dict[str, pd.DataFrame]:
    """Compute expected violations / clean rows / dup keys in pure pandas.

    Returns dict(violations=DataFrame[key.., check_name],
                 clean=DataFrame[original schema],
                 dupes=DataFrame[key.., dup_count]).
    """
    df = pdf.copy()
    if spec.drop_duplicates:
        df = df.drop_duplicates()
    if spec.drop_na:
        df = df.dropna(how="any")

    masks: dict[str, pd.Series] = {}
    for col, rules in spec.column_rules.items():
        s = df[col]
        notna = s.notna()
        if rules.is_drop_na:
            masks[f"not_null:{col}"] = s.isna()
        if rules.min is not None:
            bound = pd.Timestamp(rules.min) if str(df[col].dtype).startswith("datetime") else rules.min
            masks[f"min:{col}"] = notna & (s < bound)
        if rules.max is not None:
            bound = pd.Timestamp(rules.max) if str(df[col].dtype).startswith("datetime") else rules.max
            masks[f"max:{col}"] = notna & (s > bound)
        if rules.regex is not None:
            masks[f"regex:{col}"] = notna & ~s.astype(str).str.contains(
                rules.regex, regex=True, na=False
            )
        if rules.unique_values is not None:
            masks[f"levels:{col}"] = notna & ~s.isin(rules.unique_values)
        if rules.exclude is not None:
            masks[f"exclude:{col}"] = notna & s.isin(rules.exclude)
        if rules.reference is not None:
            valid = set(dims[rules.reference["table"]][rules.reference["column"]])
            masks[f"referential:{col}"] = notna & ~s.isin(valid)

    key = spec.uniqueness[0] if spec.uniqueness else list(df.columns[:1])
    viol_frames = []
    for name, m in masks.items():
        v = df.loc[m, key].copy()
        v["check_name"] = name
        viol_frames.append(v)
    violations = (
        pd.concat(viol_frames, ignore_index=True)
        if viol_frames
        else pd.DataFrame(columns=[*key, "check_name"])
    )

    any_viol = pd.Series(False, index=df.index)
    for m in masks.values():
        any_viol |= m
    clean = df.loc[~any_viol].copy()

    dupes = pd.DataFrame(columns=[*key, "dup_count"])
    if spec.uniqueness:
        cnt = df.groupby(key, dropna=False).size().rename("dup_count").reset_index()
        dupes = cnt[cnt["dup_count"] > 1]
        # keep-first among clean survivors, ordered by spec.order_by
        order = spec.order_by or []
        if order:
            clean = clean.sort_values([*key, *order], kind="mergesort")
        clean = clean.drop_duplicates(subset=key, keep="first")

    return {"violations": violations, "clean": clean, "dupes": dupes}
