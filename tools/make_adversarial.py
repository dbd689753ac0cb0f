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
]
pq.write_table(pa.table({
    "doc_id": pa.array([d[0] for d in docs], pa.int64()),
    "text": pa.array([d[1] for d in docs], pa.string()),
    "lang": pa.array([d[2] for d in docs], pa.string()),
    "source": pa.array([d[3] for d in docs], pa.string()),
    "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
}), dst / "documents.parquet")

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
