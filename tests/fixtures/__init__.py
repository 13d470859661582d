"""Spec-derived wire-format fixtures (VERDICT r3 item 7).

``builders.py`` hand-assembles minimal known-good byte streams directly
from the published format specifications — TIFF 6.0, BigTIFF, zarr v2,
zarr v3 (+ sharding_indexed), OME-XML 2016-06 — using ONLY the stdlib
(``struct``/``zlib``/``json``), never the IO code under test. The tests in
``tests/test_wire_formats.py`` assert that the package's from-scratch
readers parse these fixtures and that its writers reproduce the spec
fields, so a systematic wire-format error (endianness, header field,
chunk-grid key) can no longer pass via write->read self-roundtrip.
"""
