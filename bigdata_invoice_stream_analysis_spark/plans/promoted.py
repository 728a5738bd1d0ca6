"""Round-9 staged-row conversions (VERDICT r8 items 2-3) and the
staging retirements (item 6).

The r8 staging area held 51 registration-ready rows against a
registry that could not absorb them under the flat 4-round cadence
(the ceiling arithmetic in plans/tiers.py). With the tiered-cadence
policy in place, this module converts the highest-user-impact 23 in
one move — the judge's full priority list (pdf text, the PII/release/
LM-support privacy-and-quality gates, the streaming ingestion +
privacy + release drains, the lakehouse parquet control-plane reader,
the web link graph, perceptual image hashes, e-mail corpora) plus the
builder-priority balance (the four-layer document release funnel,
unicode security, the HLS⋈MPEG-TS cross-file lie check, HEIF/SVG
images, MPEG-TS demux, Spark-4 VARIANT shredding, distributed-BPE
tokens, crawl governance, temperature mixing).

Mechanics: each name moves OUT of ``STAGED_QUERIES``/``STAGED_ORACLES``
and INTO the live registry, so the staging-area count is monotonically
decreasing (r8: 51 → r9: 23 staged remain) and nothing is double-
tested. Every promoted row holds a round-9 grading-window slot
(plans/graded.py — new code is always graded the round it registers).

Staging retirements (no registry slot, capability evidence kept):

* ``gif_structure_profile`` / ``webp_structure_profile`` /
  ``audio_id3_audit`` — their distinguishing fixtures are now
  content_triage codebook variants k=39..42 (graded every time the
  triage row grades); the standalone builders move to
  ``RETIRED_TWINS`` and keep their local driver-compare parity test.
* ``zip_member_index`` / ``wds_component_index`` — offsets-only twins
  of the GRADED ``zip_text_members`` / ``wds_samples`` extraction
  rows; the graded rows subsume their operator surface (the same
  central-directory / tar walk plus decode+CRC). Also ``RETIRED_TWINS``.
"""

from __future__ import annotations

from bigdata_invoice_stream_analysis_spark.plans.queries import (
    ORACLES,
    QUERIES,
)
from bigdata_invoice_stream_analysis_spark.plans.staged import (
    STAGED_ORACLES,
    STAGED_QUERIES,
)

# Judge priority list (VERDICT r8 item 2) first, builder-priority
# balance second. Order is documentation only — the grading window is
# curated in plans/graded.py.
PROMOTED_R9: list[str] = [
    # judge's ten
    "pdf_text_extract",
    "pii_audit",
    "corpus_release_gate",
    "lm_support_audit",
    "streaming_content_triage",
    "parquet_chunk_audit",
    "warc_link_graph",
    "domain_link_profile",
    "image_phash_audit",
    "eml_corpus_audit",
    # builder-priority balance
    "document_release_funnel",
    "unicode_integrity_audit",
    "hls_segment_alignment",
    "heif_image_audit",
    "mpegts_stream_profile",
    "svg_image_audit",
    "variant_order_shred",
    "variant_schema_drift",
    "bpe_corpus_tokens",
    "streaming_pii_monitor",
    "streaming_release_monitor",
    "crawl_frontier_gate",
    "source_mixture_plan",
]

RETIRED_TWINS_R9: list[str] = [
    "gif_structure_profile",
    "webp_structure_profile",
    "audio_id3_audit",
    "zip_member_index",
    "wds_component_index",
]

# Retired-from-staging builders, still parity-tested locally
# (tests/test_staged_parity.py runs these alongside the staging area).
RETIRED_TWINS: dict = {}
RETIRED_TWIN_ORACLES: dict[str, str] = {}

for _name in PROMOTED_R9:
    QUERIES[_name] = STAGED_QUERIES.pop(_name)
    ORACLES[_name] = STAGED_ORACLES.pop(_name)

for _name in RETIRED_TWINS_R9:
    RETIRED_TWINS[_name] = STAGED_QUERIES.pop(_name)
    RETIRED_TWIN_ORACLES[_name] = STAGED_ORACLES.pop(_name)
