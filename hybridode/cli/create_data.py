"""Dataset creation CLI — replaces generated_data/*.py + create_data.sh.

Builds the seed-666 cohorts: train (n=1300), test (n=2100), noise variants
(0.4 / 0.8), dim8 and dim12 — one flag each, all in one process.
"""

from __future__ import annotations

import argparse
import os

from ..data import SyntheticCohort, add_noise, make_dim_cohort, make_test_cohort, make_train_cohort


def main(argv=None):
    parser = argparse.ArgumentParser("generate data")
    parser.add_argument("--which", default="all",
                        choices=["all", "train", "test", "noise0.4", "noise0.8", "dim8", "dim12"])
    parser.add_argument("--out", default="data/")
    parser.add_argument("--seed", default=666, type=int)
    args = parser.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    which = args.which

    def out(name):
        return os.path.join(args.out, name)

    if which in ("all", "train"):
        make_train_cohort(seed=args.seed).save(out("datafile_dose_exp.pkl"))
        print("wrote", out("datafile_dose_exp.pkl"))
    if which in ("all", "test"):
        make_test_cohort(seed=args.seed).save(out("datafile_dose_exp_test.pkl"))
        print("wrote", out("datafile_dose_exp_test.pkl"))
    for lvl in (0.4, 0.8):
        if which in ("all", f"noise{lvl}"):
            # Noise variants load the test pickle fresh each time (reference
            # generate_data_noise.py:14-23) so noise never compounds.
            if not os.path.exists(out("datafile_dose_exp_test.pkl")):
                make_test_cohort(seed=args.seed).save(out("datafile_dose_exp_test.pkl"))
            noisy = SyntheticCohort.load(out("datafile_dose_exp_test.pkl"))
            add_noise(noisy, lvl, seed=args.seed)
            noisy.save(out(f"datafile_dose_noise_{lvl}.pkl"))
            print("wrote", out(f"datafile_dose_noise_{lvl}.pkl"))
    if which in ("all", "dim8"):
        make_dim_cohort(8, seed=args.seed).save(out("datafile_dim8.pkl"))
        print("wrote", out("datafile_dim8.pkl"))
    if which in ("all", "dim12"):
        make_dim_cohort(12, seed=args.seed).save(out("datafile_dim12.pkl"))
        print("wrote", out("datafile_dim12.pkl"))


if __name__ == "__main__":
    main()
