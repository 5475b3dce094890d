import os
import random
import shutil
import subprocess

# Tests run on CPU with a virtual 8-device mesh so sharding code paths are
# exercised without TPU hardware.  The environment's sitecustomize may have
# imported jax and forced a TPU platform already, so override via
# jax.config before any backend initializes (XLA_FLAGS is read lazily at
# backend init).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# belt-and-braces against XLA:CPU stack exhaustion on deep graphs (the
# structural fix is backend-aware sequencing in fused_mem2._burn: CPU
# programs loop instead of straight-lining, so each body is a separate
# HLO computation and the compiler's pass recursion stays shallow)
import resource  # noqa: E402

try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
except (ValueError, OSError):
    pass

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# this environment's jaxlib also segfaulted inside
# LoadedExecutable.serialize() for some large XLA:CPU executables when
# the persistent compile cache writes them (same stack exhaustion);
# keep the cache off in the CPU test lane as a second guard
# (see kaiju_tpu/utils/jaxcache.py)
os.environ.setdefault("KAIJU_TPU_NO_COMPILE_CACHE", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

ORACLE_BIN = os.environ.get("KAIJU_ORACLE_BIN", "/tmp/kaiju-oracle/bin")


def oracle_available() -> bool:
    return os.path.exists(os.path.join(ORACLE_BIN, "kaiju"))


needs_oracle = pytest.mark.skipif(
    not oracle_available(), reason="reference kaiju binaries not available"
)

AA20 = "ACDEFGHIKLMNPQRSTVWY"
NUC = "ACGT"


def random_protein(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(AA20) for _ in range(n))


def random_dna(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(NUC) for _ in range(n))


def make_db_records(rng: random.Random, nseq: int = 40):
    """Synthetic protein DB with adversarial cases: duplicates, shared
    substrings, prefixes, homopolymer runs."""
    records = []
    base = random_protein(rng, 120)
    for i in range(nseq):
        taxid = rng.choice([101, 102, 103, 201, 202, 301])
        kind = i % 5
        if kind == 0:
            seq = random_protein(rng, rng.randint(30, 200))
        elif kind == 1:  # shares a long substring with base
            s = rng.randint(0, 60)
            seq = random_protein(rng, 20) + base[s : s + 50] + random_protein(rng, 20)
        elif kind == 2:  # duplicate content (tie-break exercise)
            seq = base
        elif kind == 3:  # prefix of base
            seq = base[: rng.randint(15, 100)]
        else:  # homopolymer run
            seq = random_protein(rng, 15) + "A" * rng.randint(10, 40) + random_protein(rng, 15)
        records.append((f"ACC{i:04d}.1_{taxid}", seq))
    return records


def write_fasta(records, path, width=60):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), width):
                fh.write(seq[i : i + width] + "\n")


def write_nodes_dmp(path):
    """Small taxonomy: 1 <- 10 <- {100 <- {101,102,103}, 200 <- {201,202},
    300 <- {301}}."""
    edges = {
        1: 1, 10: 1, 100: 10, 200: 10, 300: 10,
        101: 100, 102: 100, 103: 100, 201: 200, 202: 200, 301: 300,
    }
    ranks = {1: "no rank", 10: "superkingdom", 100: "genus", 200: "genus",
             300: "genus", 101: "species", 102: "species", 103: "species",
             201: "species", 202: "species", 301: "species"}
    with open(path, "w") as fh:
        for n, p in sorted(edges.items()):
            fh.write(f"{n}\t|\t{p}\t|\t{ranks[n]}\t|\n")
    return edges


def write_names_dmp(path):
    names = {1: "root", 10: "SuperK", 100: "GenusA", 200: "GenusB",
             300: "GenusC", 101: "SpeciesA1", 102: "SpeciesA2",
             103: "SpeciesA3", 201: "SpeciesB1", 202: "SpeciesB2",
             301: "SpeciesC1"}
    with open(path, "w") as fh:
        for n, nm in sorted(names.items()):
            fh.write(f"{n}\t|\t{nm}\t|\t\t|\tscientific name\t|\n")
    return names


def oracle_build_index(fasta_path: str, workdir: str, sa_exp: int = 3) -> str:
    """Run reference kaiju-mkbwt + kaiju-mkfmi; returns path to .fmi."""
    prefix = os.path.join(workdir, "refdb")
    subprocess.run(
        [
            os.path.join(ORACLE_BIN, "kaiju-mkbwt"),
            "-n", "2", "-e", str(sa_exp), "-a", AA20,
            "-o", prefix, fasta_path,
        ],
        check=True,
        capture_output=True,
    )
    subprocess.run(
        [os.path.join(ORACLE_BIN, "kaiju-mkfmi"), prefix],
        check=True,
        capture_output=True,
    )
    return prefix + ".fmi"


def run_oracle_kaiju(args: list[str]) -> str:
    """Run the reference kaiju binary, returning stdout."""
    res = subprocess.run(
        [os.path.join(ORACLE_BIN, "kaiju")] + args,
        check=True,
        capture_output=True,
        text=True,
    )
    return res.stdout


@pytest.fixture(scope="session")
def rng():
    return random.Random(12345)


@pytest.fixture(scope="session")
def db_env(tmp_path_factory):
    """Synthetic DB + taxonomy + oracle index, built once per session."""
    if not oracle_available():
        pytest.skip("reference kaiju binaries not available")
    rng_ = random.Random(999)
    workdir = str(tmp_path_factory.mktemp("dbenv"))
    records = make_db_records(rng_, nseq=40)
    fasta = os.path.join(workdir, "db.faa")
    write_fasta(records, fasta)
    nodes = os.path.join(workdir, "nodes.dmp")
    write_nodes_dmp(nodes)
    names = os.path.join(workdir, "names.dmp")
    write_names_dmp(names)
    fmi = oracle_build_index(fasta, workdir)
    return {
        "workdir": workdir,
        "records": records,
        "fasta": fasta,
        "nodes": nodes,
        "names": names,
        "fmi": fmi,
    }
