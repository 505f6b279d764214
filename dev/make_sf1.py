#!/usr/bin/env python3
"""Dev-side sf1 synthesizer for the robustness sweep (VERDICT r7 ask #6).

The driver generates fixtures up to sf0.1 only; this scales the sf0.1
documents/embeddings 10x into an sf1-equivalent under /tmp for the
pair/ANN/span family sweep. Scaling preserves the workload's shape
instead of exploding it:

- documents: each replica r appends a replica-unique token to every
  doc's text, so near-dup/exact-dup structure exists WITHIN each
  replica (pairs ~= 10x sf0.1's count) but never across replicas
  (a naive 10x copy would square the pair count and measure a
  different operator).
- embeddings: each replica adds a small deterministic per-replica
  jitter and renormalizes - same geometry, no exact cross-replica
  twins.
- events: replicated with id offsets that are multiples of
  lcm(3..13)=360360, so every RefShapes `eid % k` derivation produces
  the SAME value domains per replica (the model pipelines see 10x rows
  with an unchanged distribution, not a new workload), AND with
  timestamps offset by r*(span+1day) per replica: 10x HISTORY at the
  same event rate, not 10x density. Keeping timestamps identical
  would square every time-containment interaction - the first smoke
  measured q_ext_interval_join at 112x cost for 10x input because
  every replica's 72h windows contained every replica's events; the
  time offset zeroes cross-replica containment exactly the way the
  replica token zeroes cross-replica Jaccard (VERDICT r15 task 6).
- all other tables are hard-linked unchanged (those families read
  only documents/embeddings/events; Sources just needs the files
  present).

Usage: python3 dev/make_sf1.py [outdir]   (default /tmp/sf1)
       SF1_REPLICAS=40 python3 dev/make_sf1.py /tmp/sf4   (4x sf1 — the
       r15 decade-stretch soak input: same shape, 4x the docs)
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
REPLICAS = int(os.environ.get("SF1_REPLICAS", "10"))

os.makedirs(OUT, exist_ok=True)

# documents: replica-tag the text, remap ids
docs = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
stride = int(docs["doc_id"].max()) + 1
parts = []
for r in range(REPLICAS):
    d = docs.copy()
    d["doc_id"] = d["doc_id"] + r * stride
    if r > 0:
        if os.environ.get("SF1_DISTINCT") == "1":
            # DISTINCT replicas (r15 decade-stretch soak input). Two
            # wrong drafts taught the requirements: (a) one appended
            # token keeps long docs ABOVE 0.9 Jaccard vs their replica
            # twins — the sink dedups replicas away and the corpus never
            # grows (observed: 3.4k survivors at trigger 129); (b)
            # appending ~n/8 tokens lands replicas at J≈0.6–0.75 — BELOW
            # threshold but sharing minhash bands with probability
            # 0.13–0.32/band, so every doc drags ~#replicas candidate
            # rows through the verify and per-trigger cost ramps with
            # the replica count, a FAMILY-size pathology, not a corpus-
            # size test. Tagging EVERY token with the replica id keeps
            # within-replica dup structure EXACTLY (same transformation
            # both sides) and makes cross-replica J = 0 — the honest
            # corpus-size-scaling input.
            d["text"] = d["text"].map(
                lambda t, r=r: " ".join(f"{tok}~r{r}" for tok in t.split())
                if isinstance(t, str) else t)
        else:
            d["text"] = d["text"].map(
                lambda t, r=r: (t + f" zrepl{r}tok") if isinstance(t, str) else t)
    parts.append(d)
import pandas as pd
alld = pd.concat(parts, ignore_index=True)
pq.write_table(pa.Table.from_pandas(alld, preserve_index=False),
               f"{OUT}/documents.parquet")
print(f"documents: {len(docs)} -> {len(alld)} rows")

# embeddings: deterministic per-replica jitter, renormalize
emb = pq.read_table(f"{SRC}/embeddings.parquet").to_pandas()
vstride = int(emb["vec_id"].max()) + 1
vecs = np.stack(emb["embedding"].map(np.asarray))
dims = vecs.shape[1]
parts = []
for r in range(REPLICAS):
    e = emb.copy()
    e["vec_id"] = e["vec_id"] + r * vstride
    if r > 0:
        rng = np.random.default_rng(1234 + r)  # deterministic per replica
        v = vecs + 0.02 * rng.standard_normal(vecs.shape).astype(np.float32)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        e["embedding"] = [row.astype(np.float32) for row in v]
    parts.append(e)
alle = pd.concat(parts, ignore_index=True)
pq.write_table(pa.Table.from_pandas(alle, preserve_index=False),
               f"{OUT}/embeddings.parquet")
print(f"embeddings: {len(emb)} -> {len(alle)} rows")

# events: replicate with id offsets, keep timestamps/values/props.
# Offset is a multiple of lcm(3,4,5,6,7,8,9,11,13)=360360 and larger
# than any sf0.1 id, so replica ids never collide AND every
# RefShapes modulo-derived column (useragent, refr_medium, ...) is
# byte-identical across replicas - same distribution, 10x the rows.
# pyarrow-native (no pandas) to preserve the stored timestamp type.
ev = pq.read_table(f"{SRC}/events.parquet")
OFFSET = 720720
assert max(ev["event_id"].to_pylist()) < OFFSET and \
       max(ev["user_id"].to_pylist()) < OFFSET
import pyarrow.compute as pc
ts_us = pc.cast(ev["ts"], pa.int64())
span_us = pc.max(ts_us).as_py() - pc.min(ts_us).as_py() + 86_400_000_000
ts_type = ev.schema.field("ts").type
parts = []
for r in range(REPLICAS):
    t = ev
    if r > 0:
        t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pc.add(t["event_id"], r * OFFSET))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pc.add(t["user_id"], r * OFFSET))
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pc.cast(pc.add(ts_us, r * span_us), ts_type))
    parts.append(t)
allev = pa.concat_tables(parts)
# the pre-r16 synthesizer HARD-LINKED events.parquet from SRC: writing
# through that link would truncate the read-only fixture's inode, so
# unlink before writing
if os.path.exists(f"{OUT}/events.parquet"):
    os.remove(f"{OUT}/events.parquet")
pq.write_table(allev, f"{OUT}/events.parquet")
print(f"events: {ev.num_rows} -> {allev.num_rows} rows")

# everything else: hard-link unchanged
for f in os.listdir(SRC):
    if f in ("documents.parquet", "embeddings.parquet", "events.parquet"):
        continue
    dst = os.path.join(OUT, f)
    if os.path.exists(dst):
        os.remove(dst)
    try:
        os.link(os.path.join(SRC, f), dst)
    except OSError:
        shutil.copy(os.path.join(SRC, f), dst)
print(f"done -> {OUT}")
