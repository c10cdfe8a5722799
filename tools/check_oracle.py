#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: for each query output parquet in
outDir, run the oracle SQL in DuckDB over the sf tables, sort columns by
name, sort rows, and compare values exactly (with a small float report).

Oracle replay cache (VERDICT r16 #7): DuckDB results are memoized on
(sha256 of the oracle SQL, corpus fingerprint) under $ORACLE_CACHE
(default target/oracle_cache, gitignored). A verify loop that edits one
query re-runs ONE oracle instead of 197; any SQL edit or testdata
regeneration changes the key and misses cleanly. Learned-artifact oracles
(PCA basis, BPE merges) embed their learned values in the SQL text, so
the SQL hash covers them too. Disable with ORACLE_CACHE=off."""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

cache_dir = os.environ.get(
    "ORACLE_CACHE", os.path.join(os.path.dirname(__file__), "..",
                                 "target", "oracle_cache"))
use_cache = cache_dir != "off"
if use_cache:
    os.makedirs(cache_dir, exist_ok=True)

def corpus_fingerprint(d):
    # relpath+size+mtime of EVERY file under the corpus dir (a table may
    # be a single .parquet file or a directory of part files, any
    # extension): cheap, and any regeneration moves it (ADVICE r17: the
    # old top-level *.parquet glob missed directory-backed tables)
    parts = []
    for root, _, files in os.walk(d):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            parts.append(
                f"{os.path.relpath(p, d)}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(sorted(parts))

corpus_fp = corpus_fingerprint(sf_dir)
cache_hits = cache_misses = 0

def _file_sha(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()

def run_oracle(sql):
    """DuckDB result for sql, through the replay cache.

    A stale or corrupt hit would be a silent false-green in the round's
    central correctness signal, so an entry is only trusted when (a) its
    payload checksum matches the sidecar written at memoization time,
    and (b) at write time the parquet round-trip reproduced the live
    frame exactly, dtypes included — exotic arrow types that survive
    to_parquet but change on read (tz metadata, intervals) stay
    unmemoized rather than make cached and uncached runs compare
    differently. tools/test_oracle_cache.py exercises every
    invalidation path.
    """
    global cache_hits, cache_misses
    if not use_cache:
        return con.sql(sql).arrow().to_pandas(types_mapper=pd.ArrowDtype)
    key = hashlib.sha256((sql + "\x00" + corpus_fp).encode()).hexdigest()
    path = os.path.join(cache_dir, key + ".parquet")
    sha_path = path + ".sha256"
    if os.path.exists(path) and os.path.exists(sha_path):
        if _file_sha(path) == open(sha_path).read().strip():
            cache_hits += 1
            return pd.read_parquet(path, dtype_backend="pyarrow")
        # poisoned/corrupt payload: never trust it — evict, re-run live
        print(f"ORACLE_CACHE: rejected corrupt entry {key[:16]}…")
        for p in (path, sha_path):
            try: os.unlink(p)
            except OSError: pass
    df = con.sql(sql).arrow().to_pandas(types_mapper=pd.ArrowDtype)
    cache_misses += 1
    try:
        df.to_parquet(path, index=False)
        rt = pd.read_parquet(path, dtype_backend="pyarrow")
        if list(rt.columns) != list(df.columns) or not rt.equals(df):
            raise ValueError("parquet round-trip not faithful")
        with open(sha_path, "w") as f:
            f.write(_file_sha(path))
    except Exception:
        # uncacheable or round-trip-unfaithful result shape: stay
        # correct, just unmemoized
        for p in (path, sha_path):
            try: os.unlink(p)
            except OSError: pass
    return df

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    path = f"{out_dir}/{name}"
    if not os.path.isdir(path):
        print(f"{name}: MISSING spark output"); fails += 1; continue
    try:
        # arrow-backed dtypes keep SQL NULL (isna=True) distinct from float
        # NaN (a value, isna=False) — the driver's hash gate distinguishes
        # them, so a plain-float read that conflates both would pass locally
        # on a real NULL-vs-NaN divergence.
        spark_df = pd.concat([pd.read_parquet(p, dtype_backend="pyarrow")
                              for p in glob.glob(f"{path}/*.parquet")],
                             ignore_index=True)
        duck_df = run_oracle(sql)
    except Exception as e:
        print(f"{name}: ERROR {e}"); fails += 1; continue
    s, d = normalize(spark_df), normalize(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1; continue
    if len(s) != len(d):
        print(f"{name}: ROWCOUNT {len(s)} vs {len(d)}"); fails += 1; continue
    ok = True
    for c in s.columns:
        if pd.api.types.is_float_dtype(s[c].dtype) or pd.api.types.is_float_dtype(d[c].dtype):
            s_null, d_null = s[c].isna().to_numpy(bool), d[c].isna().to_numpy(bool)
            if (s_null != d_null).any():
                i = int(np.argmax(s_null != d_null))
                print(f"{name}: NULL-MASK col {c}: {int((s_null != d_null).sum())}"
                      f"/{len(s_null)} differ (NULL vs value/NaN), e.g. row {i}: "
                      f"spark={s[c].iloc[i]!r} duck={d[c].iloc[i]!r}")
                ok = False
                continue
            # masks agree → safe to map NULL→NaN on both sides uniformly
            sv2 = s[c].to_numpy(dtype=float, na_value=np.nan)
            dv2 = d[c].to_numpy(dtype=float, na_value=np.nan)
            same = (sv2 == dv2) | (np.isnan(sv2) & np.isnan(dv2))
            if not same.all():
                i = np.argmin(same)
                diff = np.nanmax(np.abs(sv2 - dv2))
                print(f"{name}: FLOAT col {c}: {int((~same).sum())}/{len(sv2)} differ, "
                      f"max|d|={diff:.3e}, e.g. {sv2[i]!r} vs {dv2[i]!r}")
                ok = False
        else:
            sv2 = s[c].astype(str).values; dv2 = d[c].astype(str).values
            same = sv2 == dv2
            if not same.all():
                i = np.argmin(same)
                print(f"{name}: VAL col {c}: {int((~same).sum())}/{len(sv2)} differ, "
                      f"e.g. {sv2[i]!r} vs {dv2[i]!r}")
                ok = False
    print(f"{name}: {'OK' if ok else 'FAIL'} rows={len(s)}")
    fails += 0 if ok else 1
if use_cache:
    print(f"ORACLE_CACHE: {cache_hits} hits / {cache_misses} misses "
          f"({cache_dir})")
print("RESULT:", "ALL OK" if fails == 0 else f"{fails} FAILURES")
