"""CI leak gate (round-4 verdict item 2): no internal-infrastructure
identifier may appear in the working tree or in any commit authored after
the round-4 boundary.

Round-4 LEAKCHECK found an internal package-index hostname surviving in
git HISTORY (old survey/verdict prose documenting a DNS failure); history
rewrite is out of scope, so the enforceable invariant is forward-looking:
the tree stays clean and no NEW commit (message or diff) reintroduces any
pattern class.  Patterns are assembled from fragments so this file cannot
match itself; judge/driver-written artifacts that legitimately QUOTE a
historic hit (VERDICT.md, LEAKCHECK.json, ...) are excluded from the
tree scan — they are not builder output.
"""

from __future__ import annotations

import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: Last round-4 commit (driver's artifacts commit).  Everything after it
#: is round-5+ builder output and must be clean end to end.
_BOUNDARY = "e517358"

# Assembled from fragments: the joined literal never appears in this file.
_PATTERNS = [
    ("internal-domain", re.compile(r"\." + "ant" + r"\.dev\b")),
    ("internal-pkg-index", re.compile("artifa" + "ctory", re.I)),
    ("company-name", re.compile("anthro" + "pic", re.I)),
    ("api-key", re.compile("sk-" + "ant" + "-")),
    ("slack-link", re.compile(r"slack\.com/" + "archives")),
    ("cloud-bucket", re.compile("s3:" + "//")),
    ("gcs-bucket", re.compile("gs:" + "//")),
    ("internal-env", re.compile("AXON" + "_")),
]

#: Driver/judge-written artifacts — they quote historic hits by design.
_EXCLUDE = {
    "VERDICT.md", "ADVICE.md", "LEAKCHECK.json", "COPYCHECK.json",
    "PAPERS.md", "SNIPPETS.md",
}


def _tracked_files() -> list[Path]:
    out = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True,
        check=True,
    )
    return [
        REPO / f
        for f in out.stdout.splitlines()
        if f and Path(f).name not in _EXCLUDE
    ]


def _scan(text: str, where: str, hits: list) -> None:
    for cls, rx in _PATTERNS:
        m = rx.search(text)
        if m:
            hits.append((cls, where, m.group(0)))


def test_working_tree_has_no_internal_identifiers():
    hits: list = []
    for path in _tracked_files():
        try:
            text = path.read_text(errors="replace")
        except (OSError, IsADirectoryError):
            continue
        _scan(text, str(path.relative_to(REPO)), hits)
    assert not hits, f"internal-identifier leak(s) in tree: {hits}"


def test_new_commits_have_no_internal_identifiers():
    """Messages AND diffs of every commit after the round-4 boundary.

    Diffs matter beyond the tree scan: content added then removed within
    the round would otherwise escape.  Hunks touching the excluded
    driver artifacts are skipped (they may quote historic hits)."""
    ok = subprocess.run(
        ["git", "merge-base", "--is-ancestor", _BOUNDARY, "HEAD"],
        cwd=REPO, capture_output=True,
    )
    if ok.returncode != 0:  # boundary unknown (fresh clone of a rewrite)
        rng = ["HEAD", "-n", "50"]
    else:
        rng = [f"{_BOUNDARY}..HEAD"]
    log = subprocess.run(
        ["git", "log", "-p", "--format=commit %H%n%B", *rng],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    hits: list = []
    cur_file = ""
    cur_commit = ""
    for line in log.splitlines():
        if line.startswith("commit "):
            cur_commit, cur_file = line.split()[1][:12], ""
        elif line.startswith("diff --git "):
            cur_file = line.split(" b/")[-1]
        if Path(cur_file).name in _EXCLUDE:
            continue
        _scan(line, f"{cur_commit}:{cur_file or 'message'}", hits)
    assert not hits, f"internal-identifier leak(s) in new commits: {hits}"
