"""AP evaluator sanity: perfect predictions -> AP 1.0; garbage -> low AP."""

import numpy as np

from gcanet_tpu.train.instance_eval import evaluate_matches


def _scene(perfect=True):
    n = 200
    gt_inst = np.repeat(np.arange(4), 50)
    gt_sem = np.repeat([1, 1, 2, 2], 50)
    preds = []
    for g in range(4):
        mask = gt_inst == g
        if not perfect:
            mask = np.roll(mask, 30)        # badly misaligned
        preds.append({"label_id": int(gt_sem[g * 50]), "conf": 0.9,
                      "mask": mask})
    return {"preds": preds, "gt_inst": gt_inst, "gt_sem": gt_sem}


def test_perfect_ap():
    res = evaluate_matches([_scene(True)], class_ids=[1, 2])
    assert res["all_ap"] > 0.99
    assert res["all_ap_50%"] > 0.99


def test_bad_predictions_low_ap():
    res = evaluate_matches([_scene(False)], class_ids=[1, 2])
    assert res["all_ap"] < 0.5
