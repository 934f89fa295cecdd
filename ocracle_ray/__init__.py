"""ocracle_ray — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the query/data-processing
capabilities of ``magnusendresen/OCRacle`` (reference, read-only at
``/root/reference``) over Common-Crawl-style web-page Parquet at
10^12-row design scale.

Layout:

- ``core``      pure, Ray-free, deterministic functions. Byte-identity of
                extracted text lives here; every function is unit-tested
                against hand-written goldens.
- ``sources``   input readers + the deterministic synthetic ``pages``
                table generator (schema mandated by BASELINE.json
                ``input_hint``).
- ``stages``    Ray Data ``map_batches`` wrappers (stateless fns and
                stateful actor-pool classes) around ``core``.
- ``pipelines`` end-to-end Dataset compositions (extraction flagship,
                dedup families, similarity search, text analysis) plus
                checkpoint manifests for exact resume.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions
are owned by the caller (driver, tests' conftest, bench.py) — with ONE
recorded exception: the ``python -m ocracle_ray`` CLI (``__main__.py``)
guard-inits a session for standalone use and shuts down only the
session it created.
"""

# Bump on ANY change that alters persisted record bytes (fingerprint
# scheme, extraction semantics, schema): manifest resume validates
# against this so mixed-version outputs are re-run, never merged.
ENGINE_VERSION = "0.5.0"  # 0.5.0: CCITT-fax (G4/MH) scanned PDFs now
# OCR instead of producing error records — a fax-bearing input that a
# 0.4.x manifest persisted as an error row must re-run, never merge;
# 0.4.0: PDF extraction semantics changed in
# round 3 (ObjStm/xref-stream expansion, /Length-exact stream slicing,
# structural-stream exclusion from the page fallback): PDF-1.5 inputs
# and Flate streams whose bytes end in CR/LF now extract different —
# correct — text, so pre-round-3 manifests must re-run, never merge;
# 0.3.0: null warc_ts ≡ epoch-0 loser in EVERY
# dedup mode (shuffle keep-latest previously let a null-ts copy win via
# pyarrow null_placement='at_end'); 0.2.0: FNV-1a -> blake2b-64 hashing
