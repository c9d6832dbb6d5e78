"""Deterministic synthetic transcript corpus (seed-stable, no external data).

Implements FIXTURES.md: K base entities, each expanded into several
conversations whose texts are near-duplicates with injected variants — names
with/without birth-death decorations, diacritic/punctuation noise, token
swaps/typos — plus same-name/different-domain confounders (the reference's
Schubert-composer vs Schubert-archaeologist case,
/root/reference/data/input/training_dataset.csv identities 9.0/9.1).

Output tables:
* transcripts(conv_id, turn_idx, int role, text, tool, ts) — rows shuffled, so
  ordering must come from turn_idx (per-turn text-equality invariant).
* expected_clusters(conv_id, cluster_id) — ground truth.
* labeled_pairs(left, right, match) — mirrors the reference's training CSV
  (src/training.py:1101-1128): same-entity positives, same-name hard
  negatives, random negatives.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta

import pandas as pd

_SURNAMES = [
    "Schubert", "Brahms", "Curie", "Noether", "Ramanujan", "Turing", "Lovelace",
    "Euler", "Gauss", "Hopper", "Franklin", "Darwin", "Mendel", "Kepler",
    "Hypatia", "Erdos", "Shannon", "Hamming", "Bayes", "Laplace", "Fourier",
    "Galois", "Abel", "Riemann", "Cantor", "Hilbert", "Banach", "Kolmogorov",
    "Markov", "Chebyshev", "Dirichlet", "Jacobi", "Legendre", "Poincare",
    "Weierstrass", "Dedekind", "Cauchy", "Lagrange", "Bernoulli", "Fibonacci",
]
_GIVENS = [
    "Franz", "Johannes", "Marie", "Emmy", "Srinivasa", "Alan", "Ada",
    "Leonhard", "Carl", "Grace", "Rosalind", "Charles", "Gregor", "Johannes",
    "Maria", "Paul", "Claude", "Richard", "Thomas", "Pierre", "Joseph",
    "Evariste", "Niels", "Bernhard", "Georg", "David", "Stefan", "Andrey",
]
_TOPIC_POOL = [
    # eight thematic families, flattened into one pool; each entity samples
    # its own topic vocabulary from here, so distinct entities rarely share
    # much topical overlap (two people rarely discuss identical topic mixes)
    "symphony", "sonata", "lieder", "vienna", "composition", "piano", "quartet",
    "excavation", "pottery", "stratigraphy", "bronze", "artifact", "dig", "site",
    "theorem", "proof", "algebra", "manifold", "lemma", "conjecture", "field",
    "radiation", "isotope", "laboratory", "element", "physics", "nobel", "decay",
    "cipher", "computation", "machine", "logic", "algorithm", "code", "program",
    "catalog", "manuscript", "archive", "folio", "edition", "binding", "shelf",
    "voyage", "specimen", "species", "naturalist", "island", "finch", "barnacle",
    "telescope", "orbit", "ellipse", "planet", "observation", "almanac", "star",
    "ledger", "harbor", "treaty", "parliament", "census", "plague", "guild",
    "fresco", "marble", "chapel", "patron", "canvas", "pigment", "easel",
    "glacier", "basalt", "fossil", "sediment", "quarry", "mineral", "erosion",
    "harvest", "orchard", "vineyard", "mill", "granary", "plough", "meadow",
    "frigate", "compass", "sextant", "rigging", "ballast", "anchor", "gale",
    "sermon", "abbey", "cloister", "psalter", "vellum", "scriptorium", "relic",
    "locomotive", "viaduct", "turbine", "foundry", "girder", "piston", "gauge",
    "serum", "microscope", "culture", "pathogen", "vaccine", "clinic", "lancet",
]
_TOPIC_WORDS_PER_ENTITY = 8
_FILLER = [
    "please", "review", "the", "records", "for", "this", "entry", "and",
    "confirm", "whether", "they", "refer", "to", "same", "person", "notes",
    "from", "session", "follow", "up", "on", "earlier", "discussion", "about",
]
# Tool pool matches operators.taxonomy.DEFAULT_TAXONOMY's children. Each
# ENTITY gets a stable 2-tool working profile (people keep their habits
# across conversations), so same-entity conversations share tool categories
# while confounders usually diverge — the signal the reference's taxonomy
# feature encodes via subject categories (src/taxonomy_feature.py:267-313).
_TOOL_POOL = [
    "search_catalog", "fetch_record", "lookup_authority",
    "cite_source", "run_query", "exec_code",
]
_DIACRITIC_MAP = str.maketrans({"a": "á", "e": "é", "o": "ö", "u": "ü"})


@dataclass
class Entity:
    entity_id: str
    given: str
    surname: str
    birth: int
    death: int
    domain: list[str]
    tools: list[str] | None = None


def _name_variants(rng: random.Random, e: Entity, n: int) -> list[str]:
    """Deterministic name variants for one entity: with/without life dates,
    initials, diacritics, punctuation noise, a typo."""
    base = f"{e.surname}, {e.given}"
    pool = [
        base,
        f"{e.surname}, {e.given}, {e.birth}-{e.death}",
        f"{e.surname}, {e.given}, b. {e.birth}",
        f"{e.surname}, {e.given} ({e.birth}-{e.death})",
        f"{e.surname}, {e.given[0]}.",
        f"{e.given} {e.surname}",
        base.translate(_DIACRITIC_MAP),
        f"{e.surname},  {e.given}.",
    ]
    # one-character typo variant (swap two adjacent letters of the surname)
    if len(e.surname) > 3:
        i = rng.randrange(1, len(e.surname) - 1)
        s = e.surname
        pool.append(f"{s[:i]}{s[i + 1]}{s[i]}{s[i + 2]:s}{s[i + 3:]}, {e.given}"
                    if i + 2 < len(s) else f"{s[:i]}{s[i + 1]}{s[i]}, {e.given}")
    out = [pool[0]]
    while len(out) < n:
        out.append(rng.choice(pool))
    return out[:n]


def _base_script(rng: random.Random, e: Entity, n_turns: int) -> list[str]:
    """Per-entity base conversation script. Conversations of the same entity
    are near-duplicate *perturbations* of this script (FIXTURES.md: 'texts
    are near-duplicates with injected variants'), so shingle-level similarity
    is meaningful — like the reference's catalog records, where the composite
    field repeats across occurrences of the same person."""
    script = []
    for _ in range(n_turns):
        words = rng.sample(e.domain, k=min(4, len(e.domain))) + rng.sample(
            _FILLER, k=rng.randint(4, 9)
        )
        rng.shuffle(words)
        script.append(" ".join(words))
    return script


def _perturb(rng: random.Random, text: str, drop_p: float = 0.12) -> str:
    """Token dropout + occasional adjacent swap — near-duplicate noise."""
    toks = [t for t in text.split() if rng.random() > drop_p]
    if len(toks) > 3 and rng.random() < 0.5:
        i = rng.randrange(len(toks) - 1)
        toks[i], toks[i + 1] = toks[i + 1], toks[i]
    return " ".join(toks) if toks else text


def generate(
    n_entities: int = 20,
    convs_per_entity: tuple[int, int] = (2, 4),
    turns_per_conv: tuple[int, int] = (3, 8),
    confounder_frac: float = 0.2,
    seed: int = 42,
) -> dict[str, pd.DataFrame]:
    """Build the corpus. Returns dict of pandas DataFrames:
    transcripts / expected_clusters / labeled_pairs."""
    rng = random.Random(seed)
    entities: list[Entity] = []
    n_confounder_pairs = int(n_entities * confounder_frac / 2)
    eid = 0

    def sample_topic(exclude: set[str] | None = None) -> list[str]:
        pool = [w for w in _TOPIC_POOL if not exclude or w not in exclude]
        return rng.sample(pool, _TOPIC_WORDS_PER_ENTITY)

    # Confounder pairs: same name, disjoint topics, different life dates.
    for _ in range(n_confounder_pairs):
        given = rng.choice(_GIVENS)
        surname = rng.choice(_SURNAMES)
        t1 = sample_topic()
        t2 = sample_topic(exclude=set(t1))
        b1 = rng.randint(1700, 1900)
        b2 = b1 + rng.randint(25, 60)
        for b, topic in ((b1, t1), (b2, t2)):
            entities.append(
                Entity(f"e{eid:05d}", given, surname, b, b + rng.randint(40, 80), topic)
            )
            eid += 1
    # Non-confounder entities get globally-unique (surname, given) names: two
    # *distinct* real-world entities with identical names AND identical topic
    # text would be unresolvable by any feature — only the deliberate
    # confounder pairs (distinct domains + distinct life dates) share names.
    used_names = {(e.surname, e.given) for e in entities}
    name_pool = [
        (s, g) for s in _SURNAMES for g in _GIVENS if (s, g) not in used_names
    ]
    needed = n_entities - len(entities)
    if needed > len(name_pool):
        # bench scale: extend with hyphenated double surnames (~44k combos)
        name_pool += [
            (f"{s1}-{s2}", g)
            for s1 in _SURNAMES
            for s2 in _SURNAMES
            if s1 != s2
            for g in _GIVENS
        ][: needed - len(name_pool) + 64]
    if needed > len(name_pool):
        # larger still: double given names (~30k more combos)
        name_pool += [
            (s, f"{g1} {g2}")
            for s in _SURNAMES
            for g1 in _GIVENS
            for g2 in _GIVENS
            if g1 != g2
        ][: needed - len(name_pool) + 64]
    if needed > len(name_pool):
        # scaling-protocol corpora (>75k entities): hyphenated surname x
        # double given (~1.1M combos). Built lazily like the tiers above,
        # so every corpus <= 75k keeps byte-identical names. Givens are
        # STRING-deduped first: _GIVENS carries a duplicate entry
        # ("Johannes"), and index-level combinations would hand the same
        # name string to thousands of distinct entities at this tier's
        # volume — breaking the unique-name invariant above (same name +
        # independently-sampled topics = unresolvable by construction;
        # measured as a 0.9938 -> 0.9706 bench-F1 artifact at 144k).
        gset = list(dict.fromkeys(_GIVENS))
        name_pool += [
            (f"{s1}-{s2}", f"{g1} {g2}")
            for s1 in _SURNAMES
            for s2 in _SURNAMES
            if s1 != s2
            for g1 in gset
            for g2 in gset
            if g1 != g2
        ][: needed - len(name_pool) + 64]
    rng.shuffle(name_pool)
    if needed > len(name_pool):
        raise ValueError("n_entities exceeds the unique-name pool")
    while len(entities) < n_entities:
        surname, given = name_pool.pop()
        b = rng.randint(1600, 1950)
        entities.append(
            Entity(
                f"e{eid:05d}",
                given,
                surname,
                b,
                b + rng.randint(30, 85),
                sample_topic(),
            )
        )
        eid += 1

    t_rows: list[tuple] = []
    c_rows: list[tuple] = []
    base_ts = datetime(2024, 1, 1)
    conv_seq = 0
    conv_ids_by_entity: dict[str, list[str]] = {}
    for e in entities:
        if e.tools is None:
            e.tools = rng.sample(_TOOL_POOL, 2)
        n_convs = rng.randint(*convs_per_entity)
        variants = _name_variants(rng, e, n_convs)
        script = _base_script(rng, e, turns_per_conv[1])
        conv_ids_by_entity[e.entity_id] = []
        for v in variants:
            conv_id = f"c{conv_seq:06d}"
            conv_seq += 1
            conv_ids_by_entity[e.entity_id].append(conv_id)
            c_rows.append((conv_id, e.entity_id))
            n_turns = rng.randint(*turns_per_conv)
            ts0 = base_ts + timedelta(minutes=rng.randint(0, 500000))
            for ti in range(n_turns):
                base = script[ti % len(script)]
                if ti == 0:
                    role, tool = "user", None
                    text = f"{v}. {_perturb(rng, base)}"
                else:
                    role = rng.choice(["user", "assistant", "tool"])
                    tool = rng.choice(e.tools) if role == "tool" else None
                    text = _perturb(rng, base)
                t_rows.append(
                    (conv_id, ti, role, text, tool, ts0 + timedelta(minutes=ti))
                )

    # Labeled pairs: positives within entities; hard negatives across
    # same-name confounders; random negatives.
    pairs: list[tuple[str, str, bool]] = []
    seen: set[tuple[str, str]] = set()

    def add(l: str, r: str, m: bool) -> None:
        key = (min(l, r), max(l, r))
        if l != r and key not in seen:
            seen.add(key)
            pairs.append((*key, m))

    by_name: dict[tuple[str, str], list[str]] = {}
    for e in entities:
        by_name.setdefault((e.surname, e.given), []).append(e.entity_id)
        cids = conv_ids_by_entity[e.entity_id]
        for i in range(len(cids)):
            for j in range(i + 1, len(cids)):
                add(cids[i], cids[j], True)
    for eids in by_name.values():
        for i in range(len(eids)):
            for j in range(i + 1, len(eids)):
                for lc in conv_ids_by_entity[eids[i]]:
                    for rc in conv_ids_by_entity[eids[j]]:
                        add(lc, rc, False)
    all_convs = [c for cs in conv_ids_by_entity.values() for c in cs]
    ent_of = {c: e for e, cs in conv_ids_by_entity.items() for c in cs}
    for _ in range(len(pairs)):
        l, r = rng.sample(all_convs, 2)
        add(l, r, ent_of[l] == ent_of[r])

    rng.shuffle(t_rows)  # ordering must come from turn_idx, not input order
    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    expected = pd.DataFrame(c_rows, columns=["conv_id", "cluster_id"])
    labeled = pd.DataFrame(pairs, columns=["left", "right", "match"])
    return {
        "transcripts": transcripts,
        "expected_clusters": expected,
        "labeled_pairs": labeled,
    }


def to_spark(spark, pdf: pd.DataFrame):
    """Create a Spark DataFrame with explicit schema (transcripts only)."""
    from pyspark.sql import types as T

    if list(pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]:
        schema = T.StructType(
            [
                T.StructField("conv_id", T.StringType(), False),
                T.StructField("turn_idx", T.IntegerType(), False),
                T.StructField("role", T.StringType(), True),
                T.StructField("text", T.StringType(), True),
                T.StructField("tool", T.StringType(), True),
                T.StructField("ts", T.TimestampType(), True),
            ]
        )
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)
