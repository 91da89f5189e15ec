#!/usr/bin/env bash
# Reference parity example (reference: data.sh): crop SynthMLT words, then
# build the train/test LMDB pair + dict.txt
python -m mrn_tpu.tools.crop_by_word ../dataset/SynthMLT --out_dir ../dataset/SynthMLT/crops
python -m mrn_tpu.tools.create_lmdb \
    --input_path ../dataset/SynthMLT/crops \
    --gt_file ../dataset/SynthMLT/crops/label.txt \
    --output_path ../dataset/MLT_IL/train --output_path2 ../dataset/MLT_IL/test
