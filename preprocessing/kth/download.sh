#!/bin/sh
# Downloads the raw KTH action videos (behavior parity with the reference's
# download.sh, which delegates to edenton/svg's script).

TARGET_DIR=$1
if [ -z "$TARGET_DIR" ]; then
    echo "Must specify target directory"
    exit 1
fi

mkdir -p "$TARGET_DIR/raw"
for c in boxing handclapping handwaving jogging running walking; do
    mkdir -p "$TARGET_DIR/raw/$c"
    echo "Downloading $c..."
    wget -O "$TARGET_DIR/raw/$c.zip" "http://www.csc.kth.se/cvap/actions/${c}.zip"
    unzip -o "$TARGET_DIR/raw/$c.zip" -d "$TARGET_DIR/raw/$c"
    rm "$TARGET_DIR/raw/$c.zip"
done
