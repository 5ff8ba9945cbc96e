#!/usr/bin/env python3
"""Prototype the l122 dHash on the synthetic PPM corpus: distribution of
hashes, band-candidate volume, and pair counts at several maxHamming
thresholds — run at sf0.01 and sf0.1 to pick knobs before the Scala build."""
import sys
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")

gray = ("(" + "+".join(
    f"""CASE WHEN len = 0 THEN 48 ELSE ascii(substr(text,
        CAST(((((i//9)*h//8)*w + ((i%9)*w//9))*3 + {c}) % len + 1 AS INTEGER), 1)) END"""
    for c in range(3)) + ")")

q = f"""
WITH ppm AS (
  SELECT doc_id, text, length(text) AS len,
    1 + CASE WHEN length(text) = 0 THEN 0 ELSE ascii(substr(text, 1, 1)) END % 16 AS w,
    1 + CASE WHEN length(text) = 0 THEN 0 ELSE ascii(substr(text, length(text), 1)) END % 16 AS h
  FROM documents),
g AS (SELECT doc_id, w, list_transform(range(72), i -> {gray}) AS grid FROM ppm),
dh AS (SELECT doc_id, w, grid, list_reduce(list_transform(range(64), b ->
    CASE WHEN grid[CAST((b//8)*9 + (b%8) + 1 AS INTEGER)] >
              grid[CAST((b//8)*9 + (b%8) + 2 AS INTEGER)]
         THEN CASE WHEN b = 63 THEN CAST(-9223372036854775807 AS BIGINT) - 1
              ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END
         ELSE CAST(0 AS BIGINT) END),
    (x, y) -> x + y) AS dhash FROM g)
SELECT * FROM dh
"""
con.execute(f"CREATE TABLE dh AS {q}")
n = con.execute("SELECT count(*) FROM dh").fetchone()[0]
print("docs:", n)
print("distinct dhash:", con.execute("SELECT count(DISTINCT dhash) FROM dh").fetchone()[0])
print("top hash multiplicities:", con.execute(
    "SELECT dhash, count(*) c FROM dh GROUP BY 1 ORDER BY c DESC LIMIT 5").fetchall())
print("w=1 docs:", con.execute("SELECT count(*) FROM dh WHERE w = 1").fetchone()[0])

con.execute("""CREATE TABLE bands AS
  SELECT doc_id, dhash, band_idx, (dhash >> CAST(8*band_idx AS INTEGER)) & 255 AS band_val
  FROM (SELECT doc_id, dhash, unnest(range(8)) AS band_idx FROM dh)""")
print("hot band buckets:", con.execute(
    "SELECT band_idx, band_val, count(*) c FROM bands GROUP BY 1,2 ORDER BY c DESC LIMIT 5").fetchall())
cand = con.execute("""
  SELECT count(*) FROM (
    SELECT DISTINCT x.doc_id a, y.doc_id b FROM bands x JOIN bands y
    ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
""").fetchone()[0]
print("distinct band-candidate pairs:", cand)
for mh in (0, 2, 4, 6, 8, 10):
    c = con.execute(f"""
      SELECT count(*) FROM (
        SELECT DISTINCT x.doc_id a, y.doc_id b,
          bit_count(xor(x.dhash, y.dhash)) hm FROM bands x JOIN bands y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.doc_id < y.doc_id)
      WHERE hm <= {mh}""").fetchone()[0]
    print(f"pairs at hamming<={mh}: {c}")
