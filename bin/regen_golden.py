#!/usr/bin/env python
"""Regenerate tests/vectors/golden.json from the CURRENT pinned semantics.

THE documented procedure for a deliberate signature-semantics change
(config.SEMANTICS): the golden file pins (a) the semantics fingerprint and
(b) exact signature values for a fixed text corpus, so any ACCIDENTAL
kernel change fails tests/test_reference.py. When semantics change on
purpose (e.g. the v2 span-poly feature hash), run this script, eyeball the
diff (texts must be unchanged — only values move), and commit the result
together with the config change. Stage checkpoints written under the old
fingerprint refuse to resume (tableio semantics guard), which is exactly
the protection the fingerprint exists for.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from simhash_spark import config as C  # noqa: E402
from simhash_spark import reference as R  # noqa: E402

GOLDEN = os.path.join(REPO, "tests", "vectors", "golden.json")


def main() -> None:
    with open(GOLDEN) as f:
        old = json.load(f)
    texts = [v["text"] for v in old["vectors"]]
    sigs = R.simhash64_batch(texts)
    mh = R.minhash_batch(texts)
    vectors = [
        {
            "text": t,
            "norm": R.normalize_text(t),
            "simhash64": int(s),
            "minhash8": [int(x) for x in row[:8]],
        }
        for t, s, row in zip(texts, sigs, mh)
    ]
    pairs = []
    for p in old["pairs"]:
        sa, sb = R.simhash64(p["a"]), R.simhash64(p["b"])
        pairs.append(
            {
                "a": p["a"],
                "b": p["b"],
                "hamming": int(R.hamming64(sa, sb)),
                "jaccard": R.jaccard(R.normalize_text(p["a"]), R.normalize_text(p["b"])),
            }
        )
    out = {
        "semantics": json.loads(json.dumps(dict(C.SEMANTICS))),
        "vectors": vectors,
        "pairs": pairs,
    }
    with open(GOLDEN, "w") as f:
        json.dump(out, f, indent=1, ensure_ascii=False)
    print(f"rewrote {GOLDEN}: {len(vectors)} vectors, {len(pairs)} pairs")


if __name__ == "__main__":
    main()
