"""Train the committed production-scale BPE merges table.

The synthetic documents corpus has only 31 distinct normalized words —
three orders of magnitude too small a vocabulary to learn a realistic
merge table from. This generator instead trains on a large PUBLIC text
corpus that ships inside every Python environment: the Python standard
library and PySpark source trees (~22M words, ~262K distinct normalized
words here). The corpus walk is deterministic (sorted paths, both roots
resolved from the interpreter), so the artifact is reproducible up to
the installed stdlib/pyspark versions; the trained table is committed at
data_pipeline_framework_spark/resources/bpe_merges_32k.txt so nothing at
run time depends on this script.

Usage: python tools/train_bpe_32k.py [n_merges] [out_path]
"""

from __future__ import annotations

import re
import sys
import sysconfig
import time
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_framework_spark.functions.tokenize import (  # noqa: E402
    _table_safe,
    save_merges,
    train_bpe_merges_from_counts,
)

_NORM = re.compile(r"[^a-z0-9]+")


def corpus_word_counts() -> Counter[str]:
    """Normalized word frequencies over the stdlib + pyspark sources,
    applying exactly the tokenizer's normalization (lowercase, collapse
    non-[a-z0-9] runs to a space)."""
    import pyspark

    words: Counter[str] = Counter()
    roots = (
        Path(sysconfig.get_paths()["stdlib"]),
        Path(pyspark.__file__).parent,
    )
    for root in roots:
        for p in sorted(root.rglob("*.py")):
            try:
                txt = p.read_text(encoding="utf-8", errors="ignore")
            except OSError:
                continue
            words.update(_NORM.sub(" ", txt.lower()).split())
    words.pop("", None)
    return words


def main() -> int:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 32_768
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else str(
            Path(__file__).resolve().parent.parent
            / "data_pipeline_framework_spark"
            / "resources"
            / "bpe_merges_32k.txt"
        )
    )
    t0 = time.time()
    words = corpus_word_counts()
    print(
        f"corpus: {sum(words.values())} words, {len(words)} distinct "
        f"[{time.time() - t0:.0f}s]"
    )
    t1 = time.time()
    merges = train_bpe_merges_from_counts(words, n_merges)
    print(f"trained {len(merges)} merges [{time.time() - t1:.0f}s]")
    assert _table_safe(merges), "trained table must be rank-priority safe"
    save_merges(merges, out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
