from .augment import augment_hsv, box_candidates, cutout, letterbox, mixup, random_perspective
from .datasets import YoloDataset, check_dataset, discover_images, img2label_paths, load_label_file
from .loader import DataLoader
