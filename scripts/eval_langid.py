#!/usr/bin/env python
"""Print the language-ID accuracy table over the UDHR eval sample.

Usage: python scripts/eval_langid.py [path/to/eval.jsonl]
"""

import sys

sys.path.insert(0, ".")

from pdf_extract_spark.functions.langid_eval import evaluate, load_eval_set


def main() -> None:
    samples = load_eval_set(sys.argv[1]) if len(sys.argv) > 1 else None
    r = evaluate(samples)
    print(f"{'lang':<6}{'n':>3}{'recall':>8}{'precision':>11}")
    for lang, m in r["per_lang"].items():
        prec = "-" if m["precision"] is None else f"{m['precision']:.2f}"
        print(f"{lang:<6}{m['n']:>3}{m['recall']:>8.2f}{prec:>11}")
        for text, got in m["errors"]:
            print(f"      !! -> {got}: {text[:60]}")
    print(f"\nmicro accuracy: {r['micro_accuracy']:.4f} over {r['n']} "
          f"samples, {len(r['per_lang'])} languages")


if __name__ == "__main__":
    main()
