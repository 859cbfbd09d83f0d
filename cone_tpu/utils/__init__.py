from cone_tpu.utils.io import (
    AverageMeter,
    ascii_table,
    l2_normalize,
    load_json,
    load_jsonl,
    min_max_normalize,
    save_json,
    save_jsonl,
)
