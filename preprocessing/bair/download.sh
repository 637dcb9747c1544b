#!/bin/sh
# Downloads the BAIR robot-pushing tfrecords (softmotion30_44k), behavior
# parity with the reference's download.sh (which delegates to edenton/svg).

TARGET_DIR=$1
if [ -z "$TARGET_DIR" ]; then
    echo "Must specify target directory"
    exit 1
fi

mkdir -p "$TARGET_DIR"
URL=http://rail.eecs.berkeley.edu/datasets/bair_robot_pushing_dataset_v0.tar
wget -O "$TARGET_DIR/bair_robot_pushing_dataset_v0.tar" "$URL"
tar -xvf "$TARGET_DIR/bair_robot_pushing_dataset_v0.tar" -C "$TARGET_DIR"
rm "$TARGET_DIR/bair_robot_pushing_dataset_v0.tar"
