"""Task-safety fuzz: the router must NEVER raise on any payload for
any dispatch route — a kernel exception at 100 TB is a task failure
that can kill the job (the reference's withRecovery guard,
cmd/server/main.go:539-549)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_to_text_extraction_service_spark.kernel import preview, registry, router

ALL_EXTS = sorted(registry.BY_EXT.keys())

payloads = st.one_of(
    st.binary(max_size=400),
    st.text(max_size=200).map(lambda s: s.encode("utf-8")),
    # container-ish prefixes to reach deeper kernel paths
    st.binary(max_size=200).map(lambda b: b"PK\x03\x04" + b),
    st.binary(max_size=200).map(lambda b: b"%PDF-1.4\n" + b),
    st.binary(max_size=200).map(lambda b: b"{" + b),
    st.binary(max_size=200).map(lambda b: b"<html>" + b),
)


@given(ext=st.sampled_from(ALL_EXTS), payload=payloads)
@settings(max_examples=400, deadline=None, derandomize=True)
def test_router_never_raises(ext, payload):
    res, fmt = router.extract_document(f"https://f.test/x{ext}", payload)
    assert isinstance(res.success, bool)
    assert res.success or res.error


@given(ext=st.sampled_from(ALL_EXTS), payload=payloads)
@settings(max_examples=200, deadline=None, derandomize=True)
def test_preview_never_raises(ext, payload):
    res, fmt = preview.preview_document(f"https://f.test/x{ext}", payload)
    assert isinstance(res.success, bool)
