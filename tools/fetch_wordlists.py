#!/usr/bin/env python3
"""Fetch the upstream angry-purple-tiger wordlists so animal names become
byte-compatible with the reference (be_db_gateway.erl:210 calls
erl_angry_purple_tiger:animal_name/1, whose word tables come from the
public helium/angry-purple-tiger project).

This sandbox has no network, so the repo deliberately ships WITHOUT the
upstream lists (fabricating them from memory would produce silently-wrong
names — worse than the documented fallback lists in
blockchain_etl_spark/functions/encoding.py). When network exists, closure
is one command:

    python tools/fetch_wordlists.py --dest wordlists/
    export APT_WORDLIST_DIR=$PWD/wordlists

Integrity: the first successful fetch records each file's sha256 in
``wordlists.lock.json`` next to this script (trust-on-first-use); every
later fetch verifies against the lock and refuses silently-changed
upstream content. If upstream publishes official checksums, paste them
into the lock file before the first fetch to pin from the start.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

# The upstream word tables live in the public angry-purple-tiger JS
# implementation (the Erlang port consumes the same triple). Raw-file URLs,
# newest known layout first; each candidate must yield one word per line
# after extraction.
UPSTREAM = {
    "adjectives.txt": [
        "https://raw.githubusercontent.com/helium/angry-purple-tiger/master/wordlists/adjectives.json",
        "https://raw.githubusercontent.com/helium/erl_angry_purple_tiger/master/priv/adjectives.txt",
    ],
    "colors.txt": [
        "https://raw.githubusercontent.com/helium/angry-purple-tiger/master/wordlists/colors.json",
        "https://raw.githubusercontent.com/helium/erl_angry_purple_tiger/master/priv/colors.txt",
    ],
    "animals.txt": [
        "https://raw.githubusercontent.com/helium/angry-purple-tiger/master/wordlists/animals.json",
        "https://raw.githubusercontent.com/helium/erl_angry_purple_tiger/master/priv/animals.txt",
    ],
}

LOCK_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "wordlists.lock.json")


class PinMismatchError(ValueError):
    """Fetched content does not match the recorded sha256 pin — the only
    failure that must abort instead of falling through to the next URL."""


def _to_lines(raw: bytes) -> list[str]:
    """Normalize either a JSON array of words or a plain one-per-line file."""
    text = raw.decode("utf-8")
    stripped = text.lstrip()
    if stripped.startswith("["):
        words = json.loads(text)
        if not isinstance(words, list) or not all(isinstance(w, str) for w in words):
            raise ValueError("JSON wordlist is not a flat string array")
        return [w.strip() for w in words if w.strip()]
    return [ln.strip() for ln in text.splitlines() if ln.strip()]


def _default_fetcher(url: str) -> bytes:
    from urllib.request import urlopen

    with urlopen(url, timeout=30) as r:  # noqa: S310 - documented public URLs
        return r.read()


def load_lock() -> dict:
    try:
        with open(LOCK_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def fetch_all(dest: str, fetcher=_default_fetcher) -> dict:
    """Fetch every list into ``dest``, verifying (or recording) sha256 pins.

    Returns {filename: sha256}. Raises on checksum mismatch or if no
    candidate URL yields a usable list."""
    os.makedirs(dest, exist_ok=True)
    lock = load_lock()
    out: dict[str, str] = {}
    for fname, urls in UPSTREAM.items():
        last_err: Exception | None = None
        for url in urls:
            try:
                raw = fetcher(url)
                words = _to_lines(raw)
                if len(words) < 16:
                    raise ValueError(f"suspiciously short wordlist ({len(words)}) from {url}")
                payload = ("\n".join(words) + "\n").encode()
                digest = hashlib.sha256(payload).hexdigest()
                pinned = lock.get(fname)
                if pinned and pinned != digest:
                    raise PinMismatchError(
                        f"{fname}: sha256 {digest} does not match pinned {pinned} "
                        f"(upstream changed, or a tampered mirror) — refusing"
                    )
                with open(os.path.join(dest, fname), "wb") as f:
                    f.write(payload)
                out[fname] = digest
                break
            except PinMismatchError:
                raise  # integrity failure: never fall through to a mirror
            except Exception as e:  # URL missing / bad shape / network: try next
                last_err = e
        else:
            raise RuntimeError(f"no candidate URL worked for {fname}: {last_err}")
    # trust-on-first-use: persist pins so later fetches are verified
    if out and lock != {**lock, **out}:
        with open(LOCK_PATH, "w") as f:
            json.dump({**lock, **out}, f, indent=2, sort_keys=True)
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dest", default="wordlists", help="output directory")
    args = ap.parse_args(argv)
    try:
        sums = fetch_all(args.dest)
    except Exception as e:
        print(f"fetch failed: {e}", file=sys.stderr)
        return 1
    for fname, digest in sorted(sums.items()):
        print(f"{digest}  {args.dest}/{fname}")
    print(f"export APT_WORDLIST_DIR={os.path.abspath(args.dest)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
