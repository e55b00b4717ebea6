"""Generate a schema-compatible substitute for AAV2_single_subs.json.

The reference's AAV landscape loads per-position, per-residue fitness
measurements from `AAV2_single_subs.json`, but that blob is STRIPPED from
the mounted reference (`/root/reference/.MISSING_LARGE_BLOBS`).  SURVEY.md
§7/M5 calls for a documented synthetic substitute with the identical
schema:

    {pos(str): {aa(str): {"log2_<phenotype>_v_wt": float, ...,
                          "log2_packaging_v_wt": float}}}

The synthetic landscape is deterministic (seed 0) and shaped like a
single-mutant scan of a mostly-functional capsid protein:
  * wild-type residues score ~0 by construction (log2 vs wt),
  * most substitutions are deleterious, a minority mildly beneficial,
  * per-position tolerance varies (some positions conserved, some loose),
  * packaging scores correlate with phenotype scores, and a fraction fall
    below the -6 viability cutoff that `compute_max_possible` filters on
    (reference additive_aav_packaging.py:92).

This preserves every behavioral property the framework exercises (additive
fitness, normalization, registry problems, max-possible computation) while
making no claim to reproduce the original measurements.
"""
import json
import os

import numpy as np

AAS = "ILVAGMFYWEDQNHCRKSTP"

AAV2_WT = (
    "MAADGYLPDWLEDTLSEGIRQWWKLKPGPPPPKPAERHKDDSRGLVLPGYKYLGPFNGLD"
    "KGEPVNEADAAALEHDKAYDRQLDSGDNPYLKYNHADAEFQERLKEDTSFGGNLGRAVFQ"
    "AKKRVLEPLGLVEEPVKTAPGKKRPVEHSPVEPDSSSGTGKAGQQPARKRLNFGQTGDAD"
    "SVPDPQPLGQPPAAPSGLGTNTMATGSGAPMADNNEGADGVGNSSGNWHCDSTWMGDRVI"
    "TTSTRTWALPTYNNHLYKQISSQSGASNDNHYFGYSTPWGYFDFNRFHCHFSPRDWQRLI"
    "NNNWGFRPKRLNFKLFNIQVKEVTQNDGTTTIANNLTSTVQVFTDSEYQLPYVLGSAHQG"
    "CLPPFPADVFMVPQYGYLTLNNGSQAVGRSSFYCLEYFPSQMLRTGNNFTFSYTFEDVPF"
    "HSSYAHSQSLDRLMNPLIDQYLYYLSRTNTPSGTTTQSRLQFSQAGASDIRDQSRNWLPG"
    "PCYRQQRVSKTSADNNNSEYSWTGATKYHLNGRDSLVNPGPAMASHKDDEEKFFPQSGVL"
    "IFGKQGSEKTNVDIEKVMITDEEEIRTTNPVATEQYGSVSTNLQRGNRQAATADVNTQGV"
    "LPGMVWQDRDVYLQGPIWAKIPHTDGHFHPSPLMGGFGLKHPPPQILIKNTPVPANPSTT"
    "FSAAKFASFITQYSTGQVSVEIEWELQKENSKRWNPEIQYTSNYNKSVNVDFTVDTNGVY"
    "SEPRPIGTRYLTRNL"
)

PHENOTYPES = ["heart", "lung", "kidney", "liver", "blood", "spleen"]

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "flexs_tpu",
    "landscapes",
    "data",
    "additive_aav_packaging",
    "AAV2_single_subs.json",
)


def main():
    rng = np.random.default_rng(0)
    n_pos = len(AAV2_WT)

    # Per-position conservation: low tolerance => substitutions very bad.
    tolerance = rng.beta(2.0, 2.0, size=n_pos)  # 0 = conserved, 1 = loose

    data = {}
    for pos in range(n_pos):
        wt_aa = AAV2_WT[pos]
        per_aa = {}
        # Shared per-position phenotype bias so phenotypes correlate.
        pos_bias = rng.normal(0, 0.3, size=len(PHENOTYPES))
        for aa in AAS:
            if aa == wt_aa:
                base = 0.0
            else:
                # Mostly deleterious; occasionally mildly beneficial.
                base = rng.normal(-2.5 * (1 - tolerance[pos]), 1.2)
                if rng.random() < 0.08:
                    base = abs(rng.normal(0.4, 0.3))
            packaging = base + rng.normal(0, 0.4)
            entry = {"log2_packaging_v_wt": round(float(packaging), 4)}
            for phen, bias in zip(PHENOTYPES, pos_bias):
                entry[f"log2_{phen}_v_wt"] = round(
                    float(base + bias + rng.normal(0, 0.5)), 4
                )
            per_aa[aa] = entry
        data[str(pos)] = per_aa

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(data, f)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
