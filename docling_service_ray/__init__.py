"""docling_service_ray — a Ray-Data-native main-content extraction engine.

A brand-new engine with the query/data-processing capabilities of the
reference "Docling Service" (see SURVEY.md), re-expressed Ray-Data-first:

- ``extract/``   pure-Python extractor core (HTML boilerplate strip, DOM
                 heuristics, PDF-style layout parse with reading-order
                 reconstruction). No Ray dependency — this module is also
                 the golden oracle for tests.
- ``stages/``    Ray Data stages (actor-pool extraction, conversation
                 stitching, dedup family, text analysis, similarity search,
                 multimodal stubs).
- ``pipelines/`` end-to-end Dataset pipelines (flagship transcript
                 extraction, relational reference-analog queries,
                 maintenance jobs).
- ``state/``     per-partition lineage manifests + checkpoint/resume.
- ``sources/``   pruned parquet readers for the test tables.
- ``functions/`` scalar/vectorized helpers (hashing, exact money sums).

Everything here derives from public knowledge only (Ray / pyarrow APIs and
the reference repo's observable behavior).
"""

__version__ = "0.1.0"
