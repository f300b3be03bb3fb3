"""Natural-content catalog: the 212-sequence training/eval corpus.

Behavioral counterpart of the reference's dataset catalog
(`Extract_Data/data_info.py:9-231`): the same sequence names, resolutions
and role splits, plus a filesystem scanner so the dataset builders
(`train/dataset.py`, `train/dataset_ldp.py`, `train/labels.py`) accept
real YUV files when a corpus directory is present (this environment
ships none, so everything degrades to the synthetic generators).

Resolutions are derived from the names (`_<W>x<H>` tag, else the
standard format suffix) instead of the reference's parallel
width/height arrays; the derivation is verified against the
reference's arrays in tests/test_data_info.py.

Role splits (reference index semantics):
- indices 0-11: intra image sets, AI train/valid/test x 4 sizes
  (`extract_data_AI.py:19-21`).
- indices 12-29: JCT-VC test classes A-E (test split for inter configs,
  `extract_data_LDP_LDB_RA.py:29`).
- indices 30-122: LDP/LDB/RA train+valid pool; the 10 validation
  sequences are fixed (`extract_data_LDP_LDB_RA.py:27-28`).
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, NamedTuple, Optional

#: All 212 sequence basenames, reference order (data_info.py:9-231).
NAMES: List[str] = [
    # 0-11: intra image sets (train/valid/test x 4 sizes)
    "IntraTrain_768x512", "IntraTrain_1536x1024", "IntraTrain_2880x1920",
    "IntraTrain_4928x3264", "IntraValid_768x512", "IntraValid_1536x1024",
    "IntraValid_2880x1920", "IntraValid_4928x3264", "IntraTest_768x512",
    "IntraTest_1536x1024", "IntraTest_2880x1920", "IntraTest_4928x3264",
    # 12-29: JCT-VC test classes D/C/E/B/A
    "BasketballPass_416x240_50", "BlowingBubbles_416x240_50",
    "BQSquare_416x240_60", "RaceHorses_416x240_30",
    "BasketballDrill_832x480_50", "BQMall_832x480_60",
    "PartyScene_832x480_50", "RaceHorses_832x480_30",
    "FourPeople_1280x720_60", "Johnny_1280x720_60",
    "KristenAndSara_1280x720_60", "BasketballDrive_1920x1080_50",
    "BQTerrace_1920x1080_60", "Cactus_1920x1080_50",
    "Kimono_1920x1080_24", "ParkScene_1920x1080_24",
    "PeopleOnStreet_2560x1600_30_crop", "Traffic_2560x1600_30_crop",
    # 30-122: inter train/valid pool (SIF/CIF/SD/HD mixes)
    "garden_sif", "stefan_sif", "tennis_sif", "tt_sif",
    "akiyo_cif", "bowing_cif", "bridge_close_cif", "bridge_far_cif",
    "bus_cif", "coastguard_cif", "container_cif", "deadline_cif",
    "flower_cif", "football_cif", "foreman_cif", "hall_monitor_cif",
    "highway_cif", "husky_cif", "mad900_cif", "mobile_cif",
    "mother_daughter_cif", "news_cif", "pamphlet_cif", "paris_cif",
    "sign_irene_cif", "silent_cif", "students_cif", "tempete_cif",
    "waterfall_cif",
    "flower_garden_720x480", "football_720x480", "galleon_720x480",
    "intros_720x480", "mobile_calendar_720x480", "vtc1nw_720x480",
    "washdc_720x480",
    "city_4cif", "crew_4cif", "harbour_4cif", "ice_4cif", "soccer_4cif",
    "mobcal_ter_720p50", "parkrun_ter_720p50", "shields_ter_720p50",
    "stockholm_ter_720p5994",
    "aspen_1080p", "blue_sky_1080p25", "controlled_burn_1080p",
    "crowd_run_1080p50", "dinner_1080p30", "ducks_take_off_1080p50",
    "factory_1080p30", "in_to_tree_1080p50", "life_1080p30",
    "old_town_cross_1080p50", "park_joy_1080p50",
    "pedestrian_area_1080p25", "red_kayak_1080p", "riverbed_1080p25",
    "rush_field_cuts_1080p", "rush_hour_1080p25",
    "sintel_trailer_2k_1080p24", "snow_mnt_1080p", "speed_bag_1080p",
    "station2_1080p25", "sunflower_1080p25", "touchdown_pass_1080p",
    "tractor_1080p25", "west_wind_easy_1080p",
    "Netflix_Aerial_2048x1080_60fps_420",
    "Netflix_BarScene_2048x1080_60fps_420",
    "Netflix_Boat_2048x1080_60fps_420",
    "Netflix_BoxingPractice_2048x1080_60fps_420",
    "Netflix_Crosswalk_2048x1080_60fps_420",
    "Netflix_Dancers_2048x1080_60fps_420",
    "Netflix_DinnerScene_2048x1080_60fps_420",
    "Netflix_DrivingPOV_2048x1080_60fps_420",
    "Netflix_FoodMarket_2048x1080_60fps_420",
    "Netflix_Narrator_2048x1080_60fps_420",
    "Netflix_PierSeaside_2048x1080_60fps_420",
    "Netflix_RitualDance_2048x1080_60fps_420",
    "Netflix_RollerCoaster_2048x1080_60fps_420",
    "Netflix_SquareAndTimelapse_2048x1080_60fps_420",
    "Netflix_Tango_2048x1080_60fps_420",
    "Netflix_ToddlerFountain_2048x1080_60fps_420",
    "Netflix_TunnelFlag_2048x1080_60fps_420",
    "Netflix_WindAndNature_2048x1080_60fps_420",
    "female150", "male150", "onedarkfinal", "simo", "training", "x2",
    # 123-181: 640x360 clips
    "videoSRC003_640x360_30", "videoSRC004_640x360_30",
    "videoSRC005_640x360_30", "videoSRC008_640x360_30",
    "videoSRC009_640x360_30", "videoSRC010_640x360_30",
    "videoSRC015_640x360_30", "videoSRC016_640x360_30",
    "videoSRC019_640x360_30", "videoSRC023_640x360_30",
    "videoSRC025_640x360_30", "videoSRC034_640x360_30",
    "videoSRC035_640x360_30", "videoSRC037_640x360_30",
    "videoSRC050_640x360_30", "videoSRC056_640x360_30",
    "videoSRC062_640x360_30", "videoSRC065_640x360_30",
    "videoSRC073_640x360_30", "videoSRC074_640x360_30",
    "videoSRC075_640x360_30", "videoSRC078_640x360_30",
    "videoSRC079_640x360_30", "videoSRC082_640x360_30",
    "videoSRC083_640x360_30", "videoSRC085_640x360_30",
    "videoSRC095_640x360_24", "videoSRC100_640x360_24",
    "videoSRC102_640x360_24", "videoSRC104_640x360_24",
    "videoSRC107_640x360_24", "videoSRC109_640x360_24",
    "videoSRC111_640x360_24", "videoSRC113_640x360_24",
    "videoSRC114_640x360_24", "videoSRC117_640x360_24",
    "videoSRC122_640x360_30", "videoSRC125_640x360_30",
    "videoSRC130_640x360_30", "videoSRC135_640x360_30",
    "videoSRC136_640x360_24", "videoSRC138_640x360_24",
    "videoSRC149_640x360_30", "videoSRC155_640x360_30",
    "videoSRC160_640x360_24", "videoSRC163_640x360_24",
    "videoSRC170_640x360_24", "videoSRC176_640x360_24",
    "videoSRC180_640x360_24", "videoSRC182_640x360_24",
    "videoSRC183_640x360_24", "videoSRC188_640x360_24",
    "videoSRC192_640x360_24", "videoSRC195_640x360_24",
    "videoSRC198_640x360_24", "videoSRC200_640x360_24",
    "videoSRC201_640x360_24", "videoSRC204_640x360_24",
    "videoSRC213_640x360_24",
    # 182-211: 1080p Harmonic/LiquidAssets clips
    "Harmonic_2Rally_1_1080p_30", "Harmonic_2Rally_2_1080p_30",
    "Harmonic_3fjords_1_1080p_30", "Harmonic_3fjords_2_1080p_30",
    "Harmonic_5costa_3_1080p_30", "Harmonic_5costa_5_1080p_30",
    "Harmonic_6hongkong_2_1080p_30", "Harmonic_6hongkong_6_1080p_30",
    "Harmonic_7_1_1080p_30", "Harmonic_7_7_1080p_30",
    "Harmonic_8americanfootball_2_1080p_30",
    "Harmonic_8americanfootball_7_1080p_30",
    "Harmonic_10AsianFusion_2_1080p_30",
    "Harmonic_10AsianFusion_5_1080p_30",
    "Harmonic_11skateboarding_7_1080p_30",
    "Harmonic_11skateboarding_9_1080p_30",
    "Harmonic_12redrockvol3_2_1080p_50",
    "Harmonic_12redrockvol3_5_1080p_50",
    "Harmonic_13redrockvol2_2_1080p_50",
    "Harmonic_13redrockvol2_9_1080p_50",
    "Harmonic_14airacrobatics_2_1080p_50",
    "Harmonic_14airacrobatics_3_1080p_50",
    "Harmonic_16raptors_2_1080p_50", "Harmonic_16raptors_3_1080p_50",
    "Harmonic_18ANIMALS_3_1080p_50", "Harmonic_18ANIMALS_11_1080p_50",
    "LiquidAssets_anemone_1080p_30", "LiquidAssets_blackfish_1080p_60",
    "LiquidAssets_boats_1080p_30", "LiquidAssets_diver2_1080p_30",
]

#: Format-suffix resolutions for names without an explicit _WxH tag.
_SUFFIX_RES = [
    (re.compile(r"_4cif($|_)"), (704, 576)),
    (re.compile(r"_sif($|_)"), (352, 240)),
    (re.compile(r"_cif($|_)"), (352, 288)),
    (re.compile(r"720p\d*($|_)"), (1280, 720)),
    (re.compile(r"1080p\d*($|_)"), (1920, 1080)),
]

#: Six catalog entries carry no format tag at all (all 1080p captures).
_EXPLICIT_RES = {n: (1920, 1080)
                 for n in ("female150", "male150", "onedarkfinal",
                           "simo", "training", "x2")}

_WXH = re.compile(r"_(\d+)x(\d+)")

# role splits (reference index semantics, see module docstring)
AI_TRAIN = list(range(0, 4))
AI_VALID = list(range(4, 8))
AI_TEST = list(range(8, 12))
INTER_TEST = list(range(12, 30))
INTER_VALID = [36, 42, 64, 66, 72, 74, 92, 97, 101, 110]
INTER_TRAIN = [i for i in range(30, 123) if i not in INTER_VALID]


def resolution(name: str) -> tuple:
    """(width, height) of a catalog sequence (or any name using the same
    conventions)."""
    if name in _EXPLICIT_RES:
        return _EXPLICIT_RES[name]
    m = _WXH.search(name)
    if m:
        return (int(m.group(1)), int(m.group(2)))
    for pat, res in _SUFFIX_RES:
        if pat.search(name):
            return res
    raise KeyError(f"cannot derive resolution for sequence {name!r}")


class Sequence(NamedTuple):
    name: str
    width: int
    height: int
    path: Optional[str] = None      # None = not present on disk
    n_frames: Optional[int] = None  # from the file size when present

    @property
    def frame_bytes(self) -> int:
        return self.width * self.height * 3 // 2  # planar YUV420, 8-bit


def sequence(name: str, path: Optional[str] = None) -> Sequence:
    w, h = resolution(name)
    n = None
    if path is not None:
        size = os.path.getsize(path)
        fb = w * h * 3 // 2
        if size % fb:
            raise ValueError(
                f"{path}: size {size} is not a multiple of the "
                f"{w}x{h} YUV420 frame ({fb} B)")
        n = size // fb
    return Sequence(name, w, h, path, n)


def catalog(yuv_dir: Optional[str] = None,
            indices: Optional[List[int]] = None) -> Dict[str, Sequence]:
    """The full catalog, with `path`/`n_frames` filled in for sequences
    found as `<name>.yuv` under yuv_dir. The dataset builders iterate
    this: entries with path=None fall back to synthetic content."""
    out = {}
    for i in (indices if indices is not None else range(len(NAMES))):
        name = NAMES[i]
        path = None
        if yuv_dir is not None:
            cand = os.path.join(yuv_dir, name + ".yuv")
            if os.path.exists(cand):
                path = cand
        out[name] = sequence(name, path)
    return out


def available(yuv_dir: str,
              indices: Optional[List[int]] = None) -> List[Sequence]:
    """Only the catalog sequences actually present under yuv_dir."""
    return [s for s in catalog(yuv_dir, indices).values()
            if s.path is not None]
