"""End-to-end Spark extraction job over interleaved-document tables.

Input/output table shape (BASELINE.json input_hint):
    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

``kind='pdf'`` spans carry base64 PDF bytes in ``text`` (or a ``file://``
pointer in ``media_ref``); ``kind='text'`` spans pass through
normalize/repair; ``kind='media'`` spans pass through in order.

Scale design (north rule: 10^12 docs, explicit partitioning/skew):
  * All per-document compute runs inside ONE ``mapInPandas`` pass — a
    narrow transformation with ZERO shuffles on the extraction path. Docs
    parallelize across partitions; Catalyst prunes the two input columns.
  * Skew: the reference measured a 23× latency spread between its smallest
    and largest fixture (BASELINE.md). We split the input into a small-doc
    lane (hash-partitioned on doc_id) and a big-doc lane (round-robin so
    each oversized PDF lands alone), then union — no global sort, no
    driver-side size census. ``arrow.maxRecordsPerBatch`` bounds batch
    memory so one giant doc can't OOM an Arrow batch.
  * Resume: output snapshot + per-partition lineage rows; a resumed run
    left-anti-joins the input against the committed output's doc_ids —
    a broadcast-able join at per-run failure scales.
"""

from __future__ import annotations

import base64
import time
import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SPAN_TYPE = ArrayType(
    StructType(
        [
            StructField("kind", StringType()),
            StructField("text", StringType()),
            StructField("media_ref", StringType()),
            StructField("offset", IntegerType()),
        ]
    )
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", SPAN_TYPE),
        StructField("lang", StringType()),
        StructField(
            "lang_dist",
            ArrayType(
                StructType(
                    [
                        StructField("lang", StringType()),
                        StructField("percent", DoubleType()),
                        StructField("rows", IntegerType()),
                    ]
                )
            ),
        ),
        StructField(
            "warnings",
            ArrayType(
                StructType(
                    [
                        StructField("method", StringType()),
                        StructField("detail", StringType()),
                        StructField("suggestion", StringType()),
                    ]
                )
            ),
        ),
        StructField("error", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("n_lines", IntegerType()),
        StructField("n_media", IntegerType()),
        StructField("extract_ms", LongType()),
        # S6 permissions probe (reference AccessPermission,
        # HTMLObject.java:87-98) — null for unencrypted docs
        StructField(
            "permission",
            StructType(
                [
                    StructField("is_encrypted", BooleanType()),
                    StructField("can_assembly", BooleanType()),
                    StructField("can_copy", BooleanType()),
                    StructField("can_print", BooleanType()),
                    StructField("can_print_degraded", BooleanType()),
                    StructField("can_modified", BooleanType()),
                    StructField("can_modify_annotations", BooleanType()),
                    StructField("can_fill_in_form", BooleanType()),
                    StructField("can_screen_reader", BooleanType()),
                ]
            ),
        ),
    ]
)

# Docs whose pdf payload exceeds this many base64 chars go to the big-doc
# lane (~1.5 MB of PDF ≈ the reference's skew threshold territory).
BIG_DOC_B64_CHARS = 2_000_000

_RULESET_CACHE: dict[str, Any] = {}
_SCORER_CACHE: dict[str, Any] = {}


def _get_ruleset(config: dict | None):
    """Compile the broadcast rule config once per executor process.

    Cache key is a content digest, not ``id(config)``: a long-lived
    executor Python worker serves many jobs, and after one job's config
    dict is garbage-collected a different config can land at the same
    object id and would silently receive the stale compiled ruleset."""
    import hashlib
    import json

    from ..functions.textrules import RuleSet

    key = (
        hashlib.sha256(
            json.dumps(config, sort_keys=True, default=str).encode()
        ).hexdigest()
        if config is not None else ""
    )
    rs = _RULESET_CACHE.get(key)
    if rs is None:
        rs = RuleSet(config)
        _RULESET_CACHE[key] = rs
    return rs


def _get_scorer(sj_model, sj_threshold: float | None):
    """Resolve the W4 sentence-join scorer once per executor process —
    the Spark analogue of the reference's lazily-started, per-language
    shared worker (PDFExtract.java:1723-1754): an ARPA prefix path is
    parsed once per Python worker and cached; a scorer object (small
    model) rides the task closure. Returns None when no model is
    configured, or the string ``"missing"`` when a path was given but
    unreadable (degrades to a per-doc warning, the reference's
    model-missing behavior at PDFExtract.java:1299-1324)."""
    if sj_model is None:
        return None
    if not isinstance(sj_model, str):
        if sj_threshold is not None:
            sj_model.threshold = sj_threshold
        return sj_model
    key = f"{sj_model}|{sj_threshold}"
    sc = _SCORER_CACHE.get(key)
    if sc is None:
        from ..functions.sentencejoin import SentenceJoinScorer

        try:
            # .blm binary (fast executor load) or ARPA prefix; load()
            # applies an explicit threshold, keeps the model's otherwise
            sc = SentenceJoinScorer.load(sj_model, sj_threshold)
        except (OSError, ValueError):
            sc = "missing"
        _SCORER_CACHE[key] = sc
    return sc


def _extract_batches(
    batches: Iterator[pd.DataFrame], config: dict | None, max_pages: int | None,
    sj_model=None, sj_threshold: float | None = None,
    time_budget_s: float | None = None, hooks: dict | None = None,
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: one output row per input document."""
    from ..operators.extract import extract_pdf

    rules = _get_ruleset(config)
    scorer = _get_scorer(sj_model, sj_threshold)
    if scorer is None and getattr(rules, "sj_models", None):
        # per-language models declared in the rule config
        # (``sentencejoin_model``, Config.java:126) — the in-process form
        # of the reference's one-worker-per-language cache (X2)
        scorers: dict[str, Any] = {}
        any_missing = False
        for lang, prefix in rules.sj_models.items():
            sc = _get_scorer(prefix, sj_threshold)
            if sc == "missing":
                any_missing = True
            elif sc is not None:
                scorers[lang] = sc
        if scorers:
            scorer = scorers
        elif any_missing:
            scorer = "missing"
    for pdf_batch in batches:
        out_rows = []
        for doc_id, spans in zip(pdf_batch["doc_id"], pdf_batch["spans"]):
            t0 = time.monotonic()
            row = _extract_one(str(doc_id), spans, rules, max_pages, extract_pdf,
                               scorer, time_budget_s, hooks)
            row["extract_ms"] = int((time.monotonic() - t0) * 1000)
            out_rows.append(row)
        yield pd.DataFrame(out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def _extract_one(doc_id: str, spans, rules, max_pages, extract_pdf,
                 scorer=None, time_budget_s: float | None = None,
                 hooks: dict | None = None) -> dict:
    out_spans: list[dict] = []
    lang = ""
    lang_dist: list[dict] = []
    warnings: list[dict] = []
    error = None
    n_pages = n_lines = n_media = 0
    permission = None

    sj_scorer = None
    if scorer == "missing":
        # model path configured but unreadable — reference degrades to a
        # warning and skips the stage (PDFExtract.java:1299-1324)
        warnings.append(
            {"method": "sentencejoin", "detail": "model not found",
             "suggestion": "check sentence-join model prefix path"}
        )
    elif scorer is not None:
        sj_scorer = scorer

    items = sorted(spans if spans is not None else [], key=lambda s: s["offset"])
    for span in items:
        kind = span["kind"]
        if kind == "pdf":
            pdf_bytes = _pdf_payload(span)
            if pdf_bytes is None:
                error = "pdf: missing payload"
                warnings.append(
                    {"method": "payload", "detail": "no base64/text payload",
                     "suggestion": "provide base64 body in text"}
                )
                continue
            res = extract_pdf(pdf_bytes, rules, max_pages=max_pages,
                              sj_scorer=sj_scorer,
                              time_budget_s=time_budget_s, hooks=hooks)
            if permission is None:
                permission = res.permission
            n_pages += res.n_pages
            n_lines += res.n_lines
            n_media += res.n_media
            if res.error:
                error = res.error
            if res.lang and not lang:
                lang = res.lang
                lang_dist = [
                    {"lang": l, "percent": float(p), "rows": int(c)}
                    for l, p, c in res.lang_dist
                ]
            warnings.extend(
                {"method": m, "detail": d, "suggestion": s}
                for m, d, s in res.warnings
            )
            out_spans.extend(
                {"kind": k, "text": t, "media_ref": m} for k, t, m, _ in res.spans
            )
        elif kind == "html":
            # north-rule HTML tier: DOM-heuristic boilerplate strip →
            # ordered text/media spans (functions/htmlextract.py)
            from ..functions import langid
            from ..functions.htmlextract import parse_main
            from ..operators.layout import _collapse_ws

            parsed = parse_main(span["text"] or "")
            counts: dict[str, int] = {}
            for k2, t2, m2 in parsed.out:
                if k2 == "media":
                    out_spans.append(
                        {"kind": "media", "text": "", "media_ref": m2})
                    n_media += 1
                    continue
                txt = rules.repair_str(
                    rules.normalize_str(_collapse_ws(t2)))
                if not txt.strip():
                    continue
                out_spans.append(
                    {"kind": "text", "text": txt.strip(), "media_ref": ""})
                n_lines += 1
                ln = langid.detect_reliable(txt)
                if ln:
                    counts[ln] = counts.get(ln, 0) + 1
            if counts and not lang:
                total = sum(counts.values())
                ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
                lang = ordered[0][0]
                lang_dist = [
                    {"lang": l, "percent": c * 100.0 / total, "rows": c}
                    for l, c in ordered
                ]
            elif not lang and parsed.lang_attr:
                # declared <html lang> as fallback when no line detected
                lang = parsed.lang_attr
        elif kind == "text":
            from ..operators.layout import _collapse_ws

            txt = rules.repair_str(rules.normalize_str(_collapse_ws(span["text"] or "")))
            if txt.strip():
                out_spans.append({"kind": "text", "text": txt.strip(), "media_ref": ""})
        elif kind == "media":
            out_spans.append(
                {"kind": "media", "text": "", "media_ref": span["media_ref"] or ""}
            )
    for i, s in enumerate(out_spans):
        s["offset"] = i
    return dict(
        doc_id=doc_id,
        spans=out_spans,
        lang=lang,
        lang_dist=lang_dist,
        warnings=warnings,
        error=error,
        n_pages=n_pages,
        n_lines=n_lines,
        n_media=n_media,
        extract_ms=0,
        permission=permission,
    )


def _pdf_payload(span) -> bytes | None:
    txt = span.get("text") if hasattr(span, "get") else span["text"]
    if txt:
        try:
            return base64.b64decode(txt, validate=False)
        except (ValueError, TypeError):
            return None
    ref = span.get("media_ref") if hasattr(span, "get") else span["media_ref"]
    if ref and ref.startswith("file://"):
        try:
            with open(ref[7:], "rb") as fh:
                return fh.read()
        except OSError:
            return None
    return None


def extract_spans(
    df: DataFrame,
    config: dict | None = None,
    max_pages: int | None = None,
    num_partitions: int | None = None,
    sj_model=None,
    sj_threshold: float | None = None,
    time_budget_s: float | None = None,
    hooks: dict | None = None,
) -> DataFrame:
    """The extraction operator: (doc_id, spans) → OUTPUT_SCHEMA.

    Zero-shuffle narrow map when ``num_partitions`` is None; with it, the
    two-lane skew split described in the module docstring. ``sj_model``
    enables the W4 sentence-join stage: an ARPA model prefix (visible on
    executors, e.g. shipped with ``spark-submit --files``; loaded once
    per Python worker) or an in-memory ``SentenceJoinScorer``.
    ``time_budget_s`` is the X4 per-doc budget (oversized docs produce
    partial spans + a timeout warning instead of stalling a task);
    ``hooks`` are the §2.8 Python callables (closure-pickled to
    executors — keep them module-level functions, not lambdas over big
    state)."""
    spark = df.sparkSession
    df = df.select("doc_id", "spans")  # column pruning before the UDF

    def run(d: DataFrame) -> DataFrame:
        return d.mapInPandas(
            lambda it: _extract_batches(it, config, max_pages, sj_model,
                                        sj_threshold, time_budget_s, hooks),
            schema=OUTPUT_SCHEMA,
        )

    if num_partitions is None:
        return run(df)

    # two-lane skew split: oversized pdf payloads get one-doc partitions
    size_col = F.aggregate(
        "spans",
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.when(s["kind"] == "pdf", F.length(F.coalesce(s["text"], F.lit("")))).otherwise(0),
    )
    sized = df.withColumn("_pdf_b64len", size_col)
    small = (
        sized.filter(F.col("_pdf_b64len") < BIG_DOC_B64_CHARS)
        .repartition(num_partitions, "doc_id")
        .drop("_pdf_b64len")
    )
    big = (
        sized.filter(F.col("_pdf_b64len") >= BIG_DOC_B64_CHARS)
        # round-robin across the FULL partition count: a heavy doc costs
        # ~100× a light one, so packing two into one task floors the
        # stage wall-clock (measured: 2×sample4 in one partition capped
        # 32-core scaling efficiency at ~0.3)
        .repartition(num_partitions)
        .drop("_pdf_b64len")
    )
    # big lane FIRST: Spark launches union tasks in partition-index order,
    # so oversized docs (each ~100× a light doc) start at t=0 — LPT-style
    # packing. Scheduling them last leaves a full heavy-doc straggler tail
    # (measured +35% wall at 32 cores).
    return run(big).unionByName(run(small))


def extract_spans_mirror_dedup(df: DataFrame, **kwargs) -> DataFrame:
    """Mirror-aware extraction: web corpora carry many byte-identical
    documents (mirrors, re-crawls); extract each DISTINCT payload once
    and join the result back to every carrier doc_id.

    Plan: md5(payload) → dropDuplicates (one hash-agg shuffle of the
    payload) → the normal narrow extraction over distinct payloads →
    equi-join results back on the hash. Worth it when duplicate bytes
    dominate compute (heavy mirrored PDFs); for low-duplication corpora
    the two payload shuffles cost more than the saved extraction — this
    is why it is opt-in (BENCH.md §4: payload shuffles measured ~40%
    of extraction wall at sf0.1). Per-doc timing columns reflect the
    one real extraction, shared by its mirrors."""
    # coalesce: a null spans column must hash to a real key — md5(null)
    # is null, which never equi-joins, and the doc would silently vanish
    # where plain extract_spans emits an error row for it
    hashed = df.select("doc_id", "spans").withColumn(
        "payload_md5",
        F.md5(F.coalesce(F.to_json("spans"), F.lit("null"))),
    )
    reps = (
        hashed.select(F.col("payload_md5").alias("doc_id"), "spans")
        .dropDuplicates(["doc_id"])
    )
    extracted = extract_spans(reps, **kwargs).withColumnRenamed(
        "doc_id", "payload_md5"
    )
    out = hashed.select("doc_id", "payload_md5").join(
        extracted, "payload_md5"
    )
    return out.select(*[f.name for f in OUTPUT_SCHEMA.fields])


HTML_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("html", StringType()),
        StructField("error", StringType()),
    ]
)


def _html_batches(
    batches: Iterator[pd.DataFrame], config: dict | None,
    max_pages: int | None, keep_br: bool
) -> Iterator[pd.DataFrame]:
    from ..functions.htmlout import render_document, render_error
    from ..operators.extract import extract_pdf

    rules = _get_ruleset(config)
    for b in batches:
        rows = []
        for doc_id, spans in zip(b["doc_id"], b["spans"]):
            # A document may carry several pdf spans: accumulate every
            # successful span's lines (pagenos offset so pages stay
            # distinct and ordered) and render ONE combined document;
            # per-span errors are reported alongside, never paired with
            # another span's html as if they were one extraction.
            items = sorted(spans if spans is not None else [],
                           key=lambda s: s["offset"])
            all_lines: list = []
            lang_counts: dict[str, int] = {}
            warnings: list = []
            errs: list[str] = []
            permission = None
            page_base = 0
            for span in items:
                if span["kind"] == "html":
                    # HTML tier through the S7 sink: each main-content
                    # block becomes one paragraph on its own "page"
                    # (the html doc has no page geometry); media refs
                    # are dropped here, matching the reference's
                    # image-less HTML output (PDFToHtml.java:52 -i)
                    from ..functions import langid
                    from ..functions.htmlextract import parse_main
                    from ..operators.layout import Line, _collapse_ws

                    parsed = parse_main(span["text"] or "")
                    page_base += 1
                    para = 0
                    for k2, t2, _m2 in parsed.out:
                        if k2 != "text":
                            continue
                        txt = rules.repair_str(
                            rules.normalize_str(_collapse_ws(t2))).strip()
                        if not txt:
                            continue
                        para += 1
                        ln_lang = langid.detect_reliable(txt) or ""
                        if ln_lang:
                            lang_counts[ln_lang] = (
                                lang_counts.get(ln_lang, 0) + 1)
                        all_lines.append(Line(
                            page_base, 0.0, float(para), 1.0,
                            float(para) + 0.5, 12.0, "", "", "normal",
                            "normal", "#000000", txt, 0,
                            block=para, para=para, lang=ln_lang,
                        ))
                    if not para and parsed.lang_attr:
                        lang_counts.setdefault(parsed.lang_attr, 0)
                    continue
                if span["kind"] == "text":
                    from ..operators.layout import Line, _collapse_ws

                    txt = rules.repair_str(rules.normalize_str(
                        _collapse_ws(span["text"] or ""))).strip()
                    if txt:
                        page_base += 1
                        all_lines.append(Line(
                            page_base, 0.0, 1.0, 1.0, 1.5, 12.0, "", "",
                            "normal", "normal", "#000000", txt, 0,
                            block=1, para=1,
                        ))
                    continue
                if span["kind"] != "pdf":
                    continue
                pdf = _pdf_payload(span)
                if pdf is None:
                    errs.append("pdf: missing payload")
                    continue
                res = extract_pdf(pdf, rules, max_pages=max_pages,
                                  keep_lines=True)
                if res.error:
                    errs.append(res.error)
                    continue
                span_max_page = 0
                for ln in res.lines or []:
                    ln.pageno += page_base
                    span_max_page = max(span_max_page, ln.pageno)
                    all_lines.append(ln)
                page_base = max(page_base, span_max_page, page_base + res.n_pages)
                for l, _pct, c in res.lang_dist:
                    lang_counts[l] = lang_counts.get(l, 0) + c
                warnings.extend(res.warnings)
                if res.permission is not None:
                    permission = res.permission
            if all_lines or not errs:
                total = sum(lang_counts.values())
                ordered = sorted(lang_counts.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
                lang = ordered[0][0] if ordered else ""
                # total can be 0 when the only signal is a declared
                # <html lang> attribute (count 0, no detected lines)
                lang_dist = ([(l, c * 100.0 / total, c) for l, c in ordered]
                             if total else [])
                html = render_document(
                    all_lines, lang, lang_dist, warnings,
                    keep_br=keep_br, permission=permission,
                )
            else:
                html = render_error("; ".join(errs))
            err = "; ".join(errs) if errs else None
            rows.append({"doc_id": str(doc_id), "html": html, "error": err})
        yield pd.DataFrame(rows, columns=["doc_id", "html", "error"])


def extract_html(df: DataFrame, config: dict | None = None,
                 max_pages: int | None = None,
                 keep_br: bool = False) -> DataFrame:
    """S7 HTML sink: (doc_id, spans) → (doc_id, html, error) in the
    reference's alignment-optimized format — same narrow Arrow-batched
    shape as extract_spans."""
    return df.select("doc_id", "spans").mapInPandas(
        lambda it: _html_batches(it, config, max_pages, keep_br),
        schema=HTML_SCHEMA,
    )


LINEAGE_SCHEMA = [
    "run_id", "partition_id", "doc_ids_min", "doc_ids_max",
    "n_docs", "n_ok", "n_err", "wall_ms",
]


def lineage_frame(out: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage rows (FIXTURES.md §4): the resume surface."""
    return (
        out.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(
            F.min("doc_id").alias("doc_ids_min"),
            F.max("doc_id").alias("doc_ids_max"),
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("error").isNull(), 1)).alias("n_ok"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_err"),
            F.sum("extract_ms").alias("wall_ms"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
    )


def run_pipeline(
    spark: SparkSession,
    input_ref: str,
    output_ref: str,
    lineage_ref: str | None = None,
    config: dict | None = None,
    resume: bool = False,
    num_partitions: int | None = None,
    max_pages: int | None = None,
    sj_model: str | None = None,
    sj_threshold: float | None = None,
    time_budget_s: float | None = None,
    input_format: str = "table",
    dedup_mirrors: bool = False,
    input_asof: str | None = None,
) -> dict:
    """spark-submit entry: read → (resume anti-join) → extract → commit.

    ``input_format="pdf-dir"`` reads a directory of raw PDF files (the
    reference's -I/-B modes); ``"warc"`` reads web-archive files,
    one pdf span per matching HTTP response (sources/warc.py).
    ``dedup_mirrors=True`` extracts each distinct payload once (see
    extract_spans_mirror_dedup). ``input_asof`` time-travels the table
    input to a committed snapshot (TableIO.read_asof) — reprocessing an
    exact historical corpus state. Returns a summary dict (docs in/out,
    run_id)."""
    from ..sources.tableio import TableIO

    io = TableIO(spark)
    run_id = uuid.uuid4().hex
    if input_format == "pdf-dir":
        from ..sources.corpus import read_pdf_dir

        df = read_pdf_dir(spark, input_ref)
    elif input_format == "warc":
        from ..sources.warc import read_warc

        df = read_warc(spark, input_ref)
    else:
        df = (io.read_asof(input_ref, input_asof) if input_asof
              else io.read(input_ref))
    if resume and io.exists(output_ref):
        done = io.read(output_ref).select("doc_id")
        # no forced broadcast: on a resume late in a large run the
        # committed set approaches the full corpus, and a forced hint
        # bypasses AQE's size check — let AQE pick broadcast vs shuffle
        df = df.join(done, "doc_id", "left_anti")
    extract_fn = extract_spans_mirror_dedup if dedup_mirrors else extract_spans
    out = extract_fn(df, config=config, max_pages=max_pages,
                     num_partitions=num_partitions,
                     sj_model=sj_model, sj_threshold=sj_threshold,
                     time_budget_s=time_budget_s)
    out = out.persist()
    n_out = out.count()
    # Write lineage BEFORE appending the output: on resume, `out` depends
    # on a read of output_ref (the anti-join), and appending to that path
    # invalidates/recaches every cached plan built on it — a lineage pass
    # run after the append recomputes against the just-committed output
    # and anti-joins away every row (observed: empty lineage on resumed
    # runs). Failure between the two writes only over-reports lineage;
    # resume correctness keys on committed OUTPUT doc_ids.
    lin = lineage_frame(out, run_id)
    io.write(lin, lineage_ref or output_ref.rstrip("/") + "_lineage",
             run_id=run_id, mode="append")
    io.write(out, output_ref, run_id=run_id, mode="append")
    out.unpersist()
    return {"run_id": run_id, "n_docs": n_out}
