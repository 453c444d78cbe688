import numpy as np
import pytest

from vacmap_tpu.sim.vacsim import (
    decode_sv_recipe,
    parse_parameter_file,
    simulate,
    truth_to_vcf_rows,
    write_vcf,
)
from tests.conftest import random_dna


def test_decode_recipe_del():
    rng = np.random.default_rng(0)
    s1, s2, evs = decode_sv_recipe("DEL:100:101,1", rng)
    assert evs == [["DEL", 0, 100]]
    assert s1 == 100 and s2 == 0


def test_decode_recipe_complex():
    rng = np.random.default_rng(0)
    s1, s2, evs = decode_sv_recipe("INV:50:51,NML:10:11,DEL:20:21,1", rng)
    assert [e[0] for e in evs] == ["INV", "DEL"]
    assert evs[1][1] == 60  # DEL starts after INV span + NML spacer


def test_simulate_deletion(rng):
    genome = {"c1": random_dna(rng, 50_000)}
    text = "Specified{DEL:500:501;number=3}\n"
    altered, truth = simulate(text, genome, heterozygous_ratio=0.0, seed=7)
    assert list(altered) == ["c1"]
    assert len(altered["c1"]) == 50_000 - 3 * 500
    assert len(truth) == 3
    assert all(t[0] == "DEL" for t in truth)


def test_simulate_heterozygous(rng):
    genome = {"c1": random_dna(rng, 50_000)}
    text = "Specified{INS:300:301;number=2}\n"
    altered, truth = simulate(text, genome, heterozygous_ratio=1.0, seed=7)
    assert set(altered) == {"c1_hap1", "c1_hap2"}
    assert len(altered["c1_hap1"]) == 50_000 + 2 * 300
    assert len(altered["c1_hap2"]) == 50_000  # het: hap2 keeps reference


def test_simulate_inversion_content(rng):
    genome = {"c1": random_dna(rng, 30_000)}
    text = "Specified{INV:1000:1001;number=1}\n"
    altered, truth = simulate(text, genome, heterozygous_ratio=0.0, seed=3)
    t = truth[0]
    st, en = t[2], t[3]
    from vacmap_tpu.seq import revcomp

    assert altered["c1"][st:en] == revcomp(genome["c1"][st:en])


def test_random_grammar(rng):
    genome = {"c1": random_dna(rng, 200_000)}
    text = "Random{eventset=['DEL:100:200,NML:100:200','INV:100:200'];eventcount=[1,3];number=5}\n"
    altered, truth = simulate(text, genome, heterozygous_ratio=0.0, seed=1)
    assert len(truth) >= 5


def test_vcf_output(tmp_path, rng):
    genome = {"c1": random_dna(rng, 50_000)}
    altered, truth = simulate(
        "Specified{DEL:500:501;number=2}\n", genome, 0.0, seed=5
    )
    rows = truth_to_vcf_rows(truth)
    p = tmp_path / "truth.vcf"
    write_vcf(rows, {"c1": 50_000}, str(p))
    text = p.read_text()
    assert text.startswith("##fileformat=VCFv4.2")
    body = [l for l in text.splitlines() if not l.startswith("#")]
    assert len(body) == 2
    assert "SVTYPE=DEL" in body[0]


def test_cli_roundtrip(tmp_path, rng):
    from vacmap_tpu.sim.vacsim import main

    g = tmp_path / "g.fa"
    g.write_text(">c1\n" + random_dna(rng, 60_000) + "\n")
    pf = tmp_path / "params.txt"
    pf.write_text("Specified{DEL:400:500;number=2}\n")
    alt = tmp_path / "alt.fa"
    vcf = tmp_path / "truth.vcf"
    rc = main([
        "-parameterfilepath", str(pf), "-inputgenomepath", str(g),
        "-altedgenomepath", str(alt), "-outputvcfpath", str(vcf),
        "-heterozygous_ratio", "0",
    ])
    assert rc == 0
    assert alt.exists() and vcf.exists()
