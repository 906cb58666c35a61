"""Deterministic synthetic source-code repository table (FIXTURES.md §1).

Shape per BASELINE.json input_hint: (repo, path, commit, lang, content).
Seeded, no wall-clock: the same (n_files, seed) always produces byte-equal
content (the sha256 ingest invariant depends on it).

Structure engineered to exercise the resolution pipeline exactly the way
Wikipedia titles exercise the reference's (wikiEntropy.go:156-279):

- Zipf-ish repo sizes → hub repos (skew for salting/AQE tests);
- imports that resolve exactly, imports that resolve only after
  case/underscore normalization (cf. title normalization
  wikiEntropy.go:116-118), self-imports (must be dropped, :266), and
  dangling imports (must resolve to nothing);
- langs {python, go, js} with their own import syntax, so the extraction
  regexes are genuinely per-language.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

LANGS = ("python", "go", "js")

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
).split()


def _gen_rows(n_files: int, seed: int) -> list[tuple[str, str, str, str, str]]:
    rng = random.Random(seed)
    n_repos = max(3, n_files // 20)
    # Zipf-ish popularity: repo r gets weight 1/(r+1)
    weights = [1.0 / (r + 1) for r in range(n_repos)]
    files: list[tuple[str, str, str]] = []  # (repo, path, lang)
    used = set()
    for i in range(n_files):
        r = rng.choices(range(n_repos), weights=weights)[0]
        repo = f"org{r % 7}/repo{r}"
        lang = LANGS[i % 3]
        ext = {"python": "py", "go": "go", "js": "js"}[lang]
        while True:
            parts = [rng.choice(_WORDS) for _ in range(rng.randint(1, 3))]
            path = "/".join(parts) + f"_{i}.{ext}"
            if (repo, path) not in used:
                used.add((repo, path))
                break
        files.append((repo, path, lang))

    rows = []
    for idx, (repo, path, lang) in enumerate(files):
        body = [" ".join(rng.choice(_WORDS) for _ in range(8))]
        n_imports = rng.randint(0, 6)
        for _ in range(n_imports):
            tgt_repo, tgt_path, _tl = files[rng.randrange(len(files))]
            kind = rng.random()
            ref_repo, ref_path = tgt_repo, tgt_path
            if kind < 0.15:  # case-mangled: resolves only after lowering
                ref_path = tgt_path.upper()
            elif kind < 0.25:  # dangling
                ref_path = "nowhere/" + tgt_path
            elif kind < 0.32:  # self-import (dropped downstream)
                ref_repo, ref_path = repo, path
            stem = ref_path.rsplit(".", 1)[0]
            if lang == "python":
                body.append(f"import {ref_repo}:{stem.replace('/', '.')}")
            elif lang == "go":
                body.append(f'import "{ref_repo}/{stem}"')
            else:
                body.append(f"const m = require('{ref_repo}:{stem}')")
        body.append(" ".join(rng.choice(_WORDS) for _ in range(5)))
        content = "\n".join(body)
        commit = hashlib.sha1(f"{repo}@{seed}".encode()).hexdigest()
        rows.append((repo, path, commit, lang, content))
    return rows


def synthesize_repos(
    spark: SparkSession, n_files: int = 300, seed: int = 42
) -> DataFrame:
    """The (repo, path, commit, lang, content) table, deterministic."""
    return spark.createDataFrame(
        _gen_rows(n_files, seed),
        "repo string, path string, commit string, lang string, content string",
    )
