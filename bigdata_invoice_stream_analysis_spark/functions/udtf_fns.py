"""Python UDTFs (user-defined TABLE functions, Spark 3.5+/4): one input
row → many typed output rows, usable from SQL via LATERAL joins.

The engine's hot paths stay in native expressions (repo policy —
SURVEY.md §2.11); a UDTF is the right tool when the row expansion is
genuinely procedural. ``split_sentences`` is the text-pipeline example:
segmenting documents into (sentence, offset) rows for per-sentence
dedup/quality scoring, where the splitter tracks character offsets —
state the declarative explode() cannot carry.

Usage (DataFrame):   split_sentences(F.lit(...)) — or via SQL:
    spark.udtf.register("split_sentences", split_sentences)
    spark.sql("SELECT d.doc_id, s.* FROM docs d, "
              "LATERAL split_sentences(d.text) s")
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx int, start_char int, n_chars int, sentence string")
class split_sentences:
    """Sentences = maximal runs ending at '.', '!', '?' (or EOF),
    trimmed; offsets refer to the ORIGINAL string so downstream ops can
    slice the source text. Deterministic, pure, no state across rows —
    safe under retries and speculative execution."""

    def eval(self, text: str):  # noqa: A002 - UDTF contract name
        if text is None:
            return
        idx = 0
        start = 0
        n = len(text)
        for i in range(n):
            if text[i] in ".!?":
                raw = text[start : i + 1]
                stripped = raw.strip()
                if stripped:
                    lead = len(raw) - len(raw.lstrip())
                    yield idx, start + lead, len(stripped), stripped
                    idx += 1
                start = i + 1
        raw = text[start:]
        stripped = raw.strip()
        if stripped:
            lead = len(raw) - len(raw.lstrip())
            yield idx, start + lead, len(stripped), stripped
