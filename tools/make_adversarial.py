#!/usr/bin/env python3
"""Build an adversarial scale-factor directory for the oracle gate: the
real tables from a source sf dir, with `documents` and `embeddings`
replaced by hand-built edge-case corpora — empty / whitespace-only /
1-2-token / duplicate / unicode / repeated-token / digit documents, and
zero / duplicate / linspace vectors.

This is the trap the per-round advisor kept springing (short-doc shingle
NULLs, zero-vector divides, split-of-empty-string disagreements): the
divergences only fire on data shapes the generated testdata never
contains. Run the normal gate against this dir and every one of those
classes is exercised:

    python3 tools/make_adversarial.py /root/testdata/sf0.001 /tmp/sfadv
    sbt "runMain graft.Verify /tmp/sfadv /tmp/verify_adv"
    python3 tools/check.py /tmp/sfadv /tmp/verify_adv
"""
import shutil
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
dst = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfadv")
dst.mkdir(parents=True, exist_ok=True)
for f in src.glob("*.parquet"):
    shutil.copy(f, dst / f.name)

docs = [
    (0, "", "en", "web"),                                   # empty
    (1, "   ", "en", "web"),                                # whitespace only
    (2, "one", "en", "web"),                                # 1 token
    (3, "two words", "de", "web"),                          # 2 tokens
    (4, "two words", "de", "web"),                          # exact dup of 3
    (5, "three little words", "fr", "book"),                # exactly 3 tokens
    (6, "  padded   with   runs  ", "en", "web"),           # ws runs + pad
    (7, "é ø 中文 emoji 🙂 mixed", "es", "web"),             # unicode
    (8, "the the the the the the", "en", "web"),            # repeated token
    (9, "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 4,
     "en", "book"),                                         # long
    (10, "three little words", "fr", "web"),                # dup, diff meta
    (11, "12345 67890 a1b2", "en", "web"),                  # digits
    (12, "contact jane.doe@example.com or 10.0.0.1 call 555-123-4567",
     "en", "web"),                                          # PII
    # near-dup pair where the HIGHER id has the HIGHER quality ('the' is
    # a stopword, 'The' is not) — separates the min-id and argmax-quality
    # survivor policies
    (13, "the rapid brown vulpes leaps across nine calm silver rivers "
     "daily always", "en", "web"),
    (14, "The rapid brown vulpes leaps across nine calm silver rivers "
     "daily always", "en", "web"),
    # vertical tab INSIDE words: Java regex \s includes \x0B, RE2's does
    # not — every tokenizing oracle must use the widened [\s\x0b] class or
    # it sees 3 tokens where Spark sees 5 (the r5 documented contract hole)
    (15, "vertical\x0btab\x0bdelimited tokens appear", "en", "web"),
    # symbol-rule shapes: '#', one-code-point '…', dot-run '....' (one
    # '...' occurrence + a leftover '.'), a bullet-start line and an
    # ellipsis-end line — without this doc the gopher symbol/line
    # expressions are exercised by ZERO corpus rows (second review pass)
    (16, "# heading line\n- bullet item …\nthe plain line trails off...\n"
     "symbols ## here and dots .... done", "en", "web"),
    # filler docs 17-21 push the en stratum to 17 docs: floor(4*sqrt(17))
    # = 16 < 17, so the temperature-sampling quota BINDS on this corpus —
    # without them llm_sample_temperature was pin-identical to
    # llm_sample_stratified (r6 advice)
    (17, "ordinary filler sentence number seventeen for the stratum count",
     "en", "web"),
    (18, "another plain document that only exists to raise the count",
     "en", "web"),
    (19, "quota pressure arrives once seventeen english documents exist",
     "en", "web"),
    (20, "temperature flattening keeps sixteen of these seventeen rows",
     "en", "web"),
    (21, "the last filler line completes the seventeen document stratum",
     "en", "web"),
    # retrieval probes: docs containing the tfidf/bm25 probe terms
    # ("spark", "window", "merge") — without these both rankers return
    # ZERO rows on this corpus and their adversarial pins pin an empty
    # table (found in round 8: llm_tfidf_topk and llm_bm25_topk carried
    # IDENTICAL pin hashes). 22 is short and term-dense, 23 long with
    # single occurrences: BM25's length normalization and tf saturation
    # order them differently than raw-tf TF-IDF, so the two pins must
    # now diverge — drift in either scoring path flips a pin.
    (22, "spark spark spark window merge", "en", "web"),
    (23, "a long engine discussion mentions spark once then window once "
     "then merge once among many many other ordinary filler words that "
     "stretch the document length well past the dense probe document",
     "en", "web"),
    # separator control codes INSIDE text: U+001F (engine BPE sequence
    # separator) and U+001E (oracle chr(30) reduce separator) are
    # excluded from the BPE pre-token alphabet by contract; other
    # tokenizers treat them as ordinary non-space chars (r12 advice)
    (24, "unit\u001fseparated\u001erecord controls embedded mid word",
     "en", "web"),
]
pq.write_table(pa.table({
    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
    "text": pa.array([d[1] for d in docs], pa.string()),
    "lang": pa.array([d[2] for d in docs], pa.string()),
    "source": pa.array([d[3] for d in docs], pa.string()),
    "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
}), dst / "documents.parquet")

# adversarial events: as-of boundary shapes (micro-aligned nanos — the
# Tables.events loader contract). user 104's LATEST purchase has a NULL
# value with an older non-null version behind it: ASOF must return the
# matched row wholesale (NULL), not stitch the older value.
US = 1_000  # ns per us
def ts(sec, us=0):
    return (1_704_067_200 + sec) * 1_000_000_000 + us * US  # 2024-01-01 UTC

events = [
    # (event_id, ts_ns, user_id, event_type, value, props)
    (0, ts(1000), 100, "purchase", 11.0, '{"k": 1}'),
    (1, ts(1000), 100, "click", None, '{"k": 2}'),      # click AT purchase ts
    (2, ts(0), 101, "purchase", 22.0, '{"k": 3}'),
    (3, ts(86400), 101, "click", None, '{"k": 4}'),     # gap exactly 1 day
    (4, ts(0), 102, "purchase", 33.0, '{"k": 5}'),
    (5, ts(86400, 400_000), 102, "click", None, '{"k": 6}'),  # 1d + 0.4s
    (6, ts(500), 103, "click", None, '{"k": 7}'),       # no purchase at all
    (7, ts(900), 105, "click", None, '{"k": 8}'),
    (8, ts(901), 105, "purchase", 44.0, '{"k": 9}'),    # purchase AFTER click
    (9, ts(100), 104, "purchase", 55.0, '{"k": 10}'),
    (10, ts(200), 104, "purchase", None, '{"k": 11}'),  # latest = NULL value
    (11, ts(300), 104, "click", None, '{"k": 12}'),     # must pick NULL
    (12, ts(400), 106, "signup", 1.5, "not json"),      # malformed props
    (13, ts(401), 106, "error", None, None),            # null value + props
    (14, ts(402, 1), 106, "click", 2.5, '{"k": 13}'),   # sub-second ts
]
pq.write_table(pa.table({
    "event_id": pa.array([e[0] for e in events], pa.int64()),
    "ts": pa.array([e[1] for e in events], pa.timestamp("ns")),
    "user_id": pa.array([e[2] for e in events], pa.int64()),
    "event_type": pa.array([e[3] for e in events], pa.string()),
    "value": pa.array([e[4] for e in events], pa.float64()),
    "props": pa.array([e[5] for e in events], pa.string()),
}), dst / "events.parquet")

dim = len(pq.read_table(src / "embeddings.parquet")
          .column("embedding")[0].as_py())
vecs = [
    [0.0] * dim,                       # zero vector (undefined cosine)
    [1.0] + [0.0] * (dim - 1),
    [1.0] + [0.0] * (dim - 1),         # duplicate
    [0.5] * dim,
    list(np.linspace(-1, 1, dim)),
]
pq.write_table(pa.table({
    "vec_id": pa.array(range(len(vecs)), pa.int64()),
    "embedding": pa.array([[float(x) for x in v] for v in vecs],
                          pa.list_(pa.float32())),
    "label": pa.array(range(len(vecs)), pa.int32()),
}), dst / "embeddings.parquet")
print(f"adversarial tables written to {dst}")
