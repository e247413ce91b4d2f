"""Paginated REST source tests (reference test_extract.py invariants) —
fake getter, no HTTP server."""

import pytest

from wms_data_pipeline_spark.sources.rest import (
    MAX_OFFSET,
    _assert_stable_order,
    fetch_all,
    fetch_pages,
    get_json,
)


def _rows(n, start=0):
    return [
        {"id": f"id-{i:04d}", "updated_at": f"2026-01-30T10:{i % 60:02d}:00+00:00"}
        for i in range(start, start + n)
    ]


class FakeApi:
    def __init__(self, total, limit_echo=True):
        self.rows = sorted(_rows(total), key=lambda r: (r["updated_at"], r["id"]))
        self.calls = []

    def __call__(self, url, params=None, **kw):
        self.calls.append(dict(params))
        off, lim = params["offset"], params["limit"]
        return {"data": self.rows[off : off + lim], "meta": {"count": len(self.rows)}}


def test_unknown_entity_raises():
    with pytest.raises(ValueError, match="unknown entity"):
        list(fetch_pages("http://x", "nope"))


def test_pagination_advances_and_stops_on_short_page():
    api = FakeApi(25)
    out = fetch_all("http://x", "ib_receipts", limit=10, getter=api)
    assert len(out) == 25
    assert [c["offset"] for c in api.calls] == [0, 10, 20]


def test_empty_first_page_stops():
    api = FakeApi(0)
    assert fetch_all("http://x", "ib_receipts", limit=10, getter=api) == []
    assert len(api.calls) == 1


def test_exact_multiple_fetches_trailing_empty_page():
    api = FakeApi(20)
    out = fetch_all("http://x", "ib_receipts", limit=10, getter=api)
    assert len(out) == 20
    assert [c["offset"] for c in api.calls] == [0, 10, 20]


def test_malformed_envelope_raises():
    def bad(url, params=None, **kw):
        return {"data": "not-a-list"}

    with pytest.raises(ValueError, match="malformed"):
        list(fetch_pages("http://x", "ib_receipts", getter=bad))


def test_arrival_seq_is_global_and_ordered():
    api = FakeApi(15)
    out = fetch_all("http://x", "ib_receipts", limit=10, getter=api)
    assert [r["_arrival_seq"] for r in out] == list(range(15))


def test_stable_order_assert():
    _assert_stable_order(_rows(3), "e")  # non-decreasing ok
    with pytest.raises(AssertionError):
        _assert_stable_order(list(reversed(_rows(3))), "e")


def test_runaway_guard():
    def infinite(url, params=None, **kw):
        return {"data": _rows(10, start=params["offset"])}

    with pytest.raises(RuntimeError, match="runaway"):
        # max_offset shrunk so the test is instant
        for _ in fetch_pages("http://x", "ib_receipts", limit=10, getter=infinite,
                             max_offset=50):
            pass


def test_watermark_param_forwarded():
    api = FakeApi(5)
    fetch_all("http://x", "ib_receipts", updated_after="2026-01-01T00:00:00+00:00",
              limit=10, getter=api)
    assert api.calls[0]["updated_after"] == "2026-01-01T00:00:00+00:00"


def test_get_json_retries_then_succeeds(monkeypatch):
    import urllib.request

    attempts = {"n": 0}

    class FakeResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return b'{"ok": true}'

    def flaky(url, timeout=None):
        attempts["n"] += 1
        if attempts["n"] < 3:
            import urllib.error

            raise urllib.error.URLError("boom")
        return FakeResp()

    monkeypatch.setattr(urllib.request, "urlopen", flaky)
    out = get_json("http://x/y", _sleep=lambda s: None)
    assert out == {"ok": True} and attempts["n"] == 3


def test_get_json_gives_up(monkeypatch):
    import urllib.request

    def always_fail(url, timeout=None):
        import urllib.error

        raise urllib.error.URLError("down")

    monkeypatch.setattr(urllib.request, "urlopen", always_fail)
    with pytest.raises(RuntimeError, match="failed after"):
        get_json("http://x/y", max_retries=2, _sleep=lambda s: None)
