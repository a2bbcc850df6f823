"""Training CLI (mirror of /root/reference/main.py:20-28).

Usage:
  python -m fvt_tpu.main --dataset_name MELD --dataset_path <root> \
      --modality vggish+bert+EXPR_continuous_label --model_name LFAN ...
"""
from fvt_tpu.config.parse import parse_input
from fvt_tpu.experiment import Experiment
from fvt_tpu.utils.logger import enable_jit_cache


def main(argv=None):
    enable_jit_cache()
    args = parse_input(argv)
    exp = Experiment(args)
    exp.prepare()
    exp.run()


if __name__ == '__main__':
    main()
