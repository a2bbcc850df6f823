"""Challenge inference CLI (mirror of /root/reference/inference_challenge.py).

Loads a finished TRAINING run's frozen config, retargets to
C-EXPR-DB-CHALLENGE, restores the requested best model and dumps
``pred-C-EXPR-DB-CHALLENGE/prediction.pkl``.

Usage:
  python -m fvt_tpu.inference_challenge --mode EVALUATION \
      --fd_exp <training-run-dir> --case_best_model <item> \
      --dataset_path <challenge-root> [--folds_dir <folds>]
"""
import os
from os.path import join

from fvt_tpu import constants
from fvt_tpu.config.parse import parse_input
from fvt_tpu.experiment import Experiment
from fvt_tpu.utils.logger import enable_jit_cache


def main(argv=None):
    enable_jit_cache()
    args = parse_input(argv)
    assert args.mode == constants.EVALUATION, args.mode

    exp = Experiment(args)
    exp.prepare()

    case = args.case_best_model
    best_dir = join(args.fd_exp, 'best-models')
    if case is None:
        cases = sorted(os.listdir(best_dir))
        assert cases, best_dir
        case = cases[0]
    path_model = join(best_dir, case, 'model.msgpack')
    if not os.path.isfile(path_model):
        path_model = join(best_dir, case, 'model.pt')
    exp.run_eval(path_model=path_model)


if __name__ == '__main__':
    main()
