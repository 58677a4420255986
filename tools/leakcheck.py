#!/usr/bin/env python3
"""Leak check: scan the repo's shipped text for non-public references.

Regenerates LEAKCHECK.json from an actual scan (ADVICE r8: the artifact must
be distinguishable from a hand-edited round bump). Freshness is verifiable:
the output carries the scan timestamp, the git commit scanned, the file
count, and a sha256 over every scanned byte — rerunning on the same tree
reproduces `input_sha256`; any content change alters it.

Categories mirror the driver's seven buckets. Patterns are intentionally
broad (case-insensitive); hits list file:line:match for adjudication.
"""
import hashlib
import json
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Shipped text = everything a consumer of the library would receive.
SCAN_GLOBS = [
    "src/**/*.scala",
    "tools/**/*.py",
    "tools/**/*.sh",
    "build.sbt",
    "project/*.sbt",
    "project/*.scala",
    "*.md",
]

# Self-referential outputs: the scanner's own pattern literals and the scan
# artifact's recorded hits would self-match; everything else ships.
EXCLUDED = ["tools/leakcheck.py", "LEAKCHECK.json"]

PATTERNS = {
    # imports of non-public namespaces (anything not spark/scala/java/graft)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|org\.scalatest|org\.scalacheck|"
        r"scala\.|java\.|javax\.|graft\.)[a-z_]+\.(?:internal|corp|proprietary)",
        re.I | re.M),
    # URLs that look non-public (corp/internal hosts, short-links)
    "internal-url": re.compile(
        r"https?://(?:[a-z0-9.-]*\.(?:corp|internal|intranet)\.|go/)[^\s\"']*",
        re.I),
    # non-public package/artifact coordinates in dependency position
    "internal-pkg2": re.compile(
        r"\"(?:com|io|ai)\.(?!github)[a-z0-9]+\.(?:internal|private|corp)[a-z0-9.]*\"\s*%",
        re.I),
    # cloud bucket references that are not localhost/example fixtures
    "internal-bucket": re.compile(
        r"s3a?://(?!example|test|bucket|my-bucket|localhost)[a-z0-9][a-z0-9.-]{2,}/",
        re.I),
    # slack links / channel shorthands
    "slack-link": re.compile(
        r"(?:[a-z0-9-]+\.slack\.com|slack://|#[a-z0-9-]*(?:-eng|-team|-internal)\b)",
        re.I),
    # credential-shaped strings (AWS key ids, github/slack tokens, bearer keys)
    "api-key": re.compile(
        r"(?:AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{36}|xox[baprs]-[A-Za-z0-9-]{10,}|"
        r"(?:api[_-]?key|secret[_-]?key)\s*[:=]\s*[\"'][A-Za-z0-9+/]{16,})"),
    # env vars suggesting a non-public control plane (beyond SPARK_*/COURSIER_*)
    "axon-env": re.compile(
        r"sys\.env(?:\.get(?:OrElse)?)?\(\s*\"(?!SPARK_|COURSIER_|JAVA_|HOME|PATH|TMPDIR|USER)"
        r"[A-Z][A-Z0-9_]*(?:INTERNAL|CORP|PROD|AXON)[A-Z0-9_]*\""),
}


def main() -> int:
    excluded = {(ROOT / e).resolve() for e in EXCLUDED}
    files = sorted({p for g in SCAN_GLOBS for p in ROOT.glob(g)
                    if p.is_file() and p.resolve() not in excluded})
    sha = hashlib.sha256()
    hits = {k: [] for k in PATTERNS}
    for path in files:
        text = path.read_text(errors="replace")
        sha.update(str(path.relative_to(ROOT)).encode())
        sha.update(text.encode())
        for cat, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(
                    f"{path.relative_to(ROOT)}:{line}:{m.group(0)[:80]}")
    try:
        commit = subprocess.run(
            ["git", "-C", str(ROOT), "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True).stdout.strip()
    except Exception:
        commit = "unknown"
    out = {
        "round": int(sys.argv[1]) if len(sys.argv) > 1 else None,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "scan_globs": SCAN_GLOBS,
        "excluded": EXCLUDED,
        "git_commit": commit,
        "n_files_scanned": len(files),
        "input_sha256": sha.hexdigest(),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    (ROOT / "LEAKCHECK.json").write_text(json.dumps(out, indent=2) + "\n")
    print(f"scanned {len(files)} files, {out['n_hits']} hits "
          f"-> LEAKCHECK.json (input_sha256 {out['input_sha256'][:12]}…)")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
