"""tools/fetch_wordlists.py: offline-checkable behavior — JSON/plain
normalization, trust-on-first-use pinning, tamper refusal — via an
injected fetcher (the sandbox has no network)."""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import fetch_wordlists as fw  # noqa: E402

WORDS = [f"word{i}" for i in range(32)]


def _fake_fetcher(payloads):
    def fetch(url):
        for frag, raw in payloads.items():
            if frag in url:
                return raw
        raise OSError(f"404 {url}")

    return fetch


def _payloads_json():
    return {
        "adjectives": json.dumps(WORDS).encode(),
        "colors": json.dumps(WORDS[:24]).encode(),
        "animals": json.dumps(WORDS[:20]).encode(),
    }


def test_fetch_normalizes_and_pins(tmp_path, monkeypatch):
    monkeypatch.setattr(fw, "LOCK_PATH", str(tmp_path / "lock.json"))
    dest = tmp_path / "wl"
    sums = fw.fetch_all(str(dest), fetcher=_fake_fetcher(_payloads_json()))
    assert set(sums) == {"adjectives.txt", "colors.txt", "animals.txt"}
    got = (dest / "adjectives.txt").read_text().splitlines()
    assert got == WORDS
    # lock recorded (TOFU)
    lock = json.loads((tmp_path / "lock.json").read_text())
    assert lock == sums

    # the fetched lists are loadable by the engine
    monkeypatch.setenv("APT_WORDLIST_DIR", str(dest))
    from blockchain_etl_spark.functions.encoding import load_wordlists

    adjectives, colors, animals = load_wordlists()
    assert adjectives == tuple(WORDS) and len(colors) == 24 and len(animals) == 20


def test_refetch_verifies_pin_and_refuses_tamper(tmp_path, monkeypatch):
    monkeypatch.setattr(fw, "LOCK_PATH", str(tmp_path / "lock.json"))
    dest = tmp_path / "wl"
    fw.fetch_all(str(dest), fetcher=_fake_fetcher(_payloads_json()))

    # identical re-fetch: fine
    fw.fetch_all(str(dest), fetcher=_fake_fetcher(_payloads_json()))

    # tampered upstream: refused
    bad = _payloads_json()
    bad["animals"] = json.dumps(WORDS[:20] + ["trojan"]).encode()
    import pytest

    with pytest.raises(ValueError, match="does not match pinned"):
        fw.fetch_all(str(dest), fetcher=_fake_fetcher(bad))


def test_plaintext_fallback_url_shape(tmp_path, monkeypatch):
    monkeypatch.setattr(fw, "LOCK_PATH", str(tmp_path / "lock.json"))
    plain = {
        "adjectives": ("\n".join(WORDS) + "\n").encode(),
        "colors": ("\n".join(WORDS[:24]) + "\n").encode(),
        "animals": ("\n".join(WORDS[:20]) + "\n").encode(),
    }
    sums = fw.fetch_all(str(tmp_path / "wl2"), fetcher=_fake_fetcher(plain))
    # same canonical payload => same digests as the JSON form
    monkeypatch.setattr(fw, "LOCK_PATH", str(tmp_path / "lock2.json"))
    sums_json = fw.fetch_all(str(tmp_path / "wl3"), fetcher=_fake_fetcher(_payloads_json()))
    assert sums == sums_json


def test_bad_first_url_falls_through_to_next(tmp_path, monkeypatch):
    """A malformed first candidate (restructured JSON, stub file) must try
    the documented fallback URL, not abort the fetch."""
    monkeypatch.setattr(fw, "LOCK_PATH", str(tmp_path / "lock.json"))

    plain = {
        "adjectives.txt": ("\n".join(WORDS) + "\n").encode(),
        "colors.txt": ("\n".join(WORDS[:24]) + "\n").encode(),
        "animals.txt": ("\n".join(WORDS[:20]) + "\n").encode(),
    }

    def fetch(url):
        if "angry-purple-tiger/master/wordlists" in url:
            return b'{"not": "a flat array"}'  # first candidate broken
        for fname, raw in plain.items():
            if fname.split(".")[0] in url:
                return raw
        raise OSError(f"404 {url}")

    sums = fw.fetch_all(str(tmp_path / "wl"), fetcher=fetch)
    assert set(sums) == {"adjectives.txt", "colors.txt", "animals.txt"}
