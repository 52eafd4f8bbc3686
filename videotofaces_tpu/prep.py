"""Input validation and path discovery (host-side, stdlib only).

Behavioral contract: reference prep.py — option whitelists per style
(prep.py:39-44), cluster-spec parsing (int / "a,b,c" / "a-b", prep.py:48-66),
reference-image directory scanning with the out_dir/ref fallback
(prep.py:69-105), grouping-input discovery with the faces/ fallback
(prep.py:108-120), and video-list building from a .txt / file / directory
(prep.py:123-146). Errors are printed and signalled by falsy returns, matching
the reference's non-raising CLI behavior.
"""

import os
import os.path as osp

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", ".webp")


def get_img_paths(target_dir):
    if not osp.isdir(target_dir):
        return []
    return sorted(e.path for e in os.scandir(target_dir)
                  if e.is_file() and e.name.lower().endswith(IMG_EXTENSIONS))


def check_limited_option(val, arg_name, possible_vals):
    if val not in possible_vals:
        print('ERROR: unknown %s. Available options are %s'
              % (arg_name, ', '.join('"%s"' % v for v in possible_vals)))
        return False
    return True


def validate_args(mode, input_path, out_dir, style, group_mode, video_reader,
                  det_model, enc_model):
    if not check_limited_option(mode, "mode", ["full", "detection", "grouping"]):
        return False

    ok = True
    if input_path and not osp.exists(input_path):
        print("ERROR: specified input_path doesn't exist. Please provide a valid path "
              "to a file, a directory with files, or a .txt file with full paths inside")
        ok = False
    if out_dir and not osp.isdir(out_dir):
        print("ERROR: specified out_dir doesn't exist or isn't a directory. "
              "Please provide a valid path to a directory")
        ok = False
    if not input_path and mode != "grouping":
        print("ERROR: please specify input_path")
        ok = False
    if not input_path and mode == "grouping" and not out_dir:
        print("ERROR: for grouping, please specify either out_dir or the same "
              "input_path used during detection")
        ok = False

    ok = ok and check_limited_option(style, "style", ["live", "anime"])
    ok = ok and check_limited_option(group_mode, "group_mode", ["clustering", "classification"])
    ok = ok and check_limited_option(video_reader, "video_reader", ["opencv", "decord"])
    # any model can pair with any style (the reference hard-couples them,
    # prep.py:39-44, which rejects useful combos like anime+YOLO+ViT-L);
    # crossing the usual pairing just prints a note.
    ok = ok and check_limited_option(det_model, "det_model",
                                     ["default", "yolo", "mtcnn", "rcnn"])
    ok = ok and check_limited_option(
        enc_model, "enc_model",
        ["default", "facenet_vgg", "facenet_casia", "vit_b", "vit_l"])
    if ok and det_model != "default":
        usual = {"live": ("yolo", "mtcnn"), "anime": ("rcnn",)}[style]
        if det_model not in usual:
            print('NOTE: det_model "%s" is unusual for style "%s" (trained on %s '
                  'content)' % (det_model, style,
                                "anime" if det_model == "rcnn" else "live-action"))
    if ok and enc_model != "default":
        usual = {"live": ("facenet_vgg", "facenet_casia"), "anime": ("vit_b", "vit_l")}[style]
        if enc_model not in usual:
            print('NOTE: enc_model "%s" is unusual for style "%s"' % (enc_model, style))
    return ok


def get_clusters(c):
    """Cluster-count spec -> sorted list of candidate k values."""
    if not c:
        return list(range(2, 9))
    if isinstance(c, int) and c > 0:
        return [c]
    if isinstance(c, str) and "," in c:
        parts = c.split(",")
        if all(p.isdigit() for p in parts):
            return sorted(set(int(p) for p in parts))
    if isinstance(c, str):
        parts = c.split("-")
        if len(parts) == 2 and parts[0].isdigit() and parts[1].isdigit():
            a, b = int(parts[0]), int(parts[1])
            if 0 < a < b:
                return list(range(a, b + 1))
    print('ERROR: incorrent value for clusters. Please specify a natural number or a '
          'string either as an enumeration "C1,C2,C3,C4" or a range "A-B" where 0 < A < B')
    return None


def get_class_ref(ref_dir, out_dir):
    """Scan ref_dir subfolders -> [(class_name, [image_paths])]."""
    explanation = ("Please prepare a directory with 1 or more subfolders representing "
                   "groups, each with 1 or more reference images inside")
    if not ref_dir:
        fallback = osp.join(out_dir, "ref")
        if osp.isdir(fallback):
            print('NOTE: ref_dir is unspecified, but found "ref" folder inside out_dir. '
                  'Will search for reference images there')
            ref_dir = fallback
        else:
            print('ERROR: for group_mode="classification", ref_dir needs to be specified')
            print(explanation)
            return None
    if not osp.isdir(ref_dir):
        print("ERROR: specified ref_dir doesn't exist or isn't a directory. "
              "Please provide a valid path to a directory")
        return None

    classes = sorted(e.name for e in os.scandir(ref_dir) if e.is_dir())
    if not classes:
        print("ERROR: specified ref_dir doesn't contain any subfolders")
        print(explanation)
        return None

    refs, warnings = [], []
    for c in classes:
        imgs = get_img_paths(osp.join(ref_dir, c))
        if imgs:
            refs.append((c, imgs))
        else:
            warnings.append('WARNING: ref_dir\'s subfolder "%s" doesn\'t contain any '
                            'images. During classification, this class will be ignored' % c)
    if not refs:
        print("ERROR: none of the ref_dir's subfolders contain any images")
        print("Supported extensions are: %s" % ", ".join(IMG_EXTENSIONS))
        return None
    for w in warnings:
        print(w)
    return refs


def get_paths_for_grouping(out_dir):
    """Images to group: prefer out_dir/faces (the detection output layout),
    fall back to out_dir itself."""
    for tdir in (osp.join(out_dir, "faces"), out_dir):
        paths = get_img_paths(tdir)
        if paths:
            print("Found %u images at: %s" % (len(paths), tdir))
            return paths
    print("ERROR: no image files for grouping found at: %s" % out_dir)
    return None


def get_video_list(input_path, ext):
    """Video list from a .txt manifest, a single file, or a directory."""
    if osp.isfile(input_path) and input_path.lower().endswith(".txt"):
        with open(input_path) as f:
            files = [ln.strip() for ln in f.read().splitlines() if osp.isfile(ln.strip())]
        if not files:
            print("ERROR: specified .txt file doesn't contain any valid paths. Please "
                  "provide a file with paths to videos, each on a separate line")
        return files

    if osp.isfile(input_path):
        return [input_path]

    files = [osp.join(input_path, p) for p in sorted(os.listdir(input_path))
             if osp.isfile(osp.join(input_path, p))]
    if not files:
        print("ERROR: no files are found in the specified input directory")
    if ext:
        files = [s for s in files if s.lower().split(".")[-1] in ext.split(";")]
        if not files:
            print("ERROR: no files with specified extensions (%s) are found in the "
                  "input directory" % ext)
    return files
