import json
import os

import numpy as np
from PIL import Image

from detectax.data import convert_coco, convert_crowdhuman, convert_voc
from detectax.data.index import IndexDataset, load_index
from detectax.data.pipeline import Loader

VOC_XML = """<annotation>
  <filename>{name}.jpg</filename>
  <size><width>200</width><height>100</height><depth>3</depth></size>
  <object><name>dog</name>
    <bndbox><xmin>20</xmin><ymin>10</ymin><xmax>120</xmax><ymax>60</ymax></bndbox>
  </object>
  <object><name>person</name>
    <bndbox><xmin>100</xmin><ymin>40</ymin><xmax>180</xmax><ymax>90</ymax></bndbox>
  </object>
  <object><name>unicorn</name>
    <bndbox><xmin>0</xmin><ymin>0</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
</annotation>"""


def _write_jpg(path, w=200, h=100):
    Image.fromarray(
        np.zeros((h, w, 3), np.uint8)
    ).save(path)


def test_convert_voc_reads_all_objects(tmp_path):
    ann = tmp_path / "ann"
    img = tmp_path / "img"
    ann.mkdir()
    img.mkdir()
    for i in range(2):
        (ann / f"s{i}.xml").write_text(VOC_XML.format(name=f"s{i}"))
        _write_jpg(img / f"s{i}.jpg")
    out = tmp_path / "voc.json"
    n, skipped = convert_voc.convert(str(ann), str(img), str(out))
    assert n == 2
    assert skipped == 2  # one unknown 'unicorn' per file
    classes, samples = load_index(str(out))
    assert len(classes) == 20
    s = samples[0]
    # reference reads only the FIRST object per file; we read all (fix)
    assert len(s["boxes_xyxy"]) == 2
    np.testing.assert_allclose(
        s["boxes_xyxy"][0], [0.1, 0.1, 0.6, 0.6], atol=1e-6
    )
    assert s["min_side"] == 384 and s["u_jitter"] == 384


def test_convert_coco_objectness_offset(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    _write_jpg(img_dir / "a.jpg", 100, 100)
    coco = {
        "images": [{"id": 7, "file_name": "a.jpg", "width": 100, "height": 100}],
        "categories": [{"id": 3, "name": "cat"}, {"id": 9, "name": "dog"}],
        "annotations": [
            {"image_id": 7, "category_id": 9, "bbox": [10, 20, 30, 40], "iscrowd": 0},
            {"image_id": 7, "category_id": 3, "bbox": [0, 0, 0, 10], "iscrowd": 0},
        ],
    }
    jf = tmp_path / "inst.json"
    jf.write_text(json.dumps(coco))
    out = tmp_path / "coco.json"
    n, nb = convert_coco.convert(str(jf), str(img_dir), str(out))
    assert n == 1 and nb == 1  # degenerate box dropped
    classes, samples = load_index(str(out))
    assert classes == ["cat", "dog"]
    assert samples[0]["labels"] == [1]
    np.testing.assert_allclose(
        samples[0]["boxes_xyxy"][0], [0.1, 0.2, 0.4, 0.6], atol=1e-6
    )
    # objectness prepend shifts labels by +1 (reference quirk)
    out2 = tmp_path / "coco2.json"
    convert_coco.convert(str(jf), str(img_dir), str(out2), prepend_objectness=True)
    classes2, samples2 = load_index(str(out2))
    assert classes2[0] == "objectness"
    assert samples2[0]["labels"] == [2]


def test_convert_crowdhuman(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    _write_jpg(img_dir / "x.jpg", 400, 200)
    odgt = {
        "ID": "x",
        "gtboxes": [
            {"tag": "person", "fbox": [40, 20, 80, 100], "extra": {}},
            {"tag": "person", "fbox": [0, 0, 50, 50], "extra": {"ignore": 1}},
            {"tag": "mask", "fbox": [0, 0, 10, 10], "extra": {}},
        ],
    }
    f = tmp_path / "ann.odgt"
    f.write_text(json.dumps(odgt) + "\n")
    out = tmp_path / "ch.json"
    n, nb = convert_crowdhuman.convert(str(f), str(img_dir), str(out))
    assert n == 1 and nb == 1
    classes, samples = load_index(str(out))
    assert classes == ["person"]
    np.testing.assert_allclose(
        samples[0]["boxes_xyxy"][0], [0.1, 0.1, 0.3, 0.6], atol=1e-6
    )


def test_index_dataset_feeds_loader(tmp_path):
    ann = tmp_path / "ann"
    img = tmp_path / "img"
    ann.mkdir()
    img.mkdir()
    for i in range(4):
        (ann / f"s{i}.xml").write_text(VOC_XML.format(name=f"s{i}"))
        _write_jpg(img / f"s{i}.jpg")
    out = tmp_path / "voc.json"
    convert_voc.convert(str(ann), str(img), str(out))
    ds = IndexDataset(str(out))
    assert ds.num_classes == 20
    loader = Loader(ds, batch_size=2, canvas=128, max_boxes=8, steps=1,
                    prefetch=0)
    b = next(iter(loader))
    assert b["images"].shape == (2, 128, 128, 3)
    assert b["valid"].sum() == 4  # 2 boxes per image
