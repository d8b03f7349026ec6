"""CLI: convert raw BTXRD (labelme + metadata) into a training-ready dir.

Parity target: /root/reference/src/pipeline/label_parsing.py:96-143's CLI:
  python -m multitask_bonetumor_yolo_tpu.cli.prepare_data \
      --src BTXRD --meta dataset.csv --dst btxrd_ready
"""

from ..data.convert import main

if __name__ == "__main__":
    main()
