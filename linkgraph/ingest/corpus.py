"""Deterministic synthetic source-code corpus generator.

Produces the BASELINE.json `input_hint` table
``(repo, path, commit, lang, content)`` entirely with distributed
column expressions over ``spark.range`` — no driver-side lists, so the
same generator scales from the pytest fixtures (hundreds of rows) to
bench graphs (millions) without changing shape. Everything derives
arithmetically from the row id and a seed: identical output at any
parallelism level, which the resumability and two-parallelism scaling
tests depend on.

Shape (FIXTURES.md §2):
- ``n_repos`` repos over 7 orgs, file i belongs to repo i % n_repos;
- 1..20 commits per repo, commit = 40-hex sha2 of "repo:slot";
- lang ∈ {python, scala, java} weighted 70/20/10;
- content holds real ``import`` lines referencing other repos' modules
  (these induce the edge table) plus filler, with module m(i) defined by
  file i as "repo{r}.mod{i}";
- a hub: ~30% of files import repo0's module (power-law tail fixture,
  exercises hub salting / AQE skew paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "scala", "java"]
EXT = {"python": "py", "scala": "scala", "java": "java"}


def synthetic_corpus(
    spark: SparkSession,
    n_files: int = 1000,
    n_repos: int = 50,
    imports_per_file: int = 3,
    hub_fraction_mod: int = 10,  # i % mod < 3  => imports the hub repo0
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Corpus DataFrame (repo, path, commit, lang, content)."""
    df = spark.range(n_files, numPartitions=partitions)
    i = F.col("id")
    # mix the seed into every derived stream via a cheap LCG-ish mix
    mix = (i * F.lit(2654435761) + F.lit(seed)) % F.lit(2**31)

    r = (i % n_repos).alias("r")
    df = df.select(i.alias("i"), r, mix.alias("mix"))

    repo = F.concat(F.lit("org"), (F.col("r") % 7), F.lit("/repo"), F.col("r"))
    lang = (
        F.when((F.col("mix") % 10) < 7, F.lit("python"))
        .when((F.col("mix") % 10) < 9, F.lit("scala"))
        .otherwise(F.lit("java"))
    )
    df = df.withColumn("repo", repo).withColumn("lang", lang)

    ext = F.element_at(
        F.create_map(
            *[x for k, v in EXT.items() for x in (F.lit(k), F.lit(v))]
        ),
        F.col("lang"),
    )
    path = F.concat(
        F.lit("src/pkg"), (F.col("i") % 5), F.lit("/mod"), F.col("i"), F.lit("."), ext
    )
    n_commits = (F.col("mix") % 20) + 1
    commit = F.sha2(
        F.concat(F.col("repo"), F.lit(":"), (F.col("mix") % n_commits)), 256
    ).substr(1, 40)
    df = df.withColumn("path", path).withColumn("commit", commit)

    # Import targets: imports_per_file pseudo-random other repos, each
    # resolved to a concrete file of that repo (file indices of repo j
    # are j, j+n_repos, j+2*n_repos, ...). Module m(t) = "repo{j}.mod{t}".
    files_per_repo = max(1, n_files // n_repos)
    import_stmts = []
    for s in range(imports_per_file):
        j = (F.col("i") * 13 + F.col("mix") + s * 7919) % n_repos
        slot = (F.col("i") * 31 + s * 104729 + F.col("mix")) % files_per_repo
        t = j + slot * n_repos
        stmt = F.concat(
            F.lit("import repo"), j, F.lit(".mod"), t,
            F.when(F.col("lang") == "java", F.lit(";")).otherwise(F.lit("")),
        )
        import_stmts.append(stmt)
    hub = F.when(
        (F.col("mix") % hub_fraction_mod) < 3,
        F.concat(
            F.lit("import repo0.mod0"),
            F.when(F.col("lang") == "java", F.lit(";")).otherwise(F.lit("")),
        ),
    )
    header = F.concat(
        F.lit("// file "), F.col("path"), F.lit(" of "), F.col("repo")
    )
    body = F.concat(
        F.lit("def work_"), F.col("i"),
        F.lit("():\n    return "), (F.col("mix") % 99991),
    )
    content = F.concat_ws(
        "\n", header, *import_stmts, *([hub] if hub_fraction_mod else []), body
    )
    return df.select(
        "repo", "path", "commit", "lang", content.alias("content")
    )
