#!/bin/sh
# End-to-end MS-COCO data preparation (capability parity: reference
# scripts/dataset/setup.sh — download + preprocess everything the framework
# needs). Requires network access; each step is restartable.
#
# Usage: sh scripts/dataset/setup.sh /path/to/dataset_dir
set -e
DATASET_DIR="${1:?usage: setup.sh <dataset_dir>}"
SCRIPTS_DIR="$(cd "$(dirname "$0")" && pwd)"
mkdir -p "$DATASET_DIR"
cd "$DATASET_DIR"

# 1. Karpathy split captions
if [ ! -f dataset_coco.json ]; then
  wget -c https://cs.stanford.edu/people/karpathy/deepimagesent/caption_datasets.zip
  unzip -o caption_datasets.zip dataset_coco.json
fi

# 2. COCO val2014 annotations (for the metric stack)
if [ ! -f annotations/captions_val2014.json ]; then
  wget -c http://images.cocodataset.org/annotations/annotations_trainval2014.zip
  unzip -o annotations_trainval2014.zip annotations/captions_val2014.json
fi

# 3. Bottom-up-attention features (Anderson et al., fixed 36 boxes)
mkdir -p bu_tsv
if [ ! -f bu_tsv/trainval/karpathy_train_resnet101_faster_rcnn_genome.tsv.0 ]; then
  echo ">> Download trainval_36.zip / test2014_36.zip from"
  echo ">> https://github.com/peteanderson80/bottom-up-attention into $DATASET_DIR/bu_tsv and unzip."
  echo ">> (The hosting moves around; see that repo's README for current links.)"
  exit 1
fi

# 4. TSV -> per-image npy
python "$SCRIPTS_DIR/make_bu_data.py" --downloaded_feats bu_tsv --output_dir bu/cocobu

# 5. Relative box coordinates (requires the COCO images, or a sizes JSON)
python "$SCRIPTS_DIR/prepro_bbox_relative_coords.py" \
  --input_box_dir bu/cocobu_box --input_json dataset_coco.json \
  --image_root "$DATASET_DIR" --output_dir bu/cocobu_box_relative

# 6. CIDEr-D document frequencies for SCST
python "$SCRIPTS_DIR/prepro_ngrams.py" --input_json dataset_coco.json \
  --split train --output_pkl bu/coco-train-words

echo "dataset ready at $DATASET_DIR"
