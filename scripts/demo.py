"""Interactive text-mode simulator demo (replaces src/driver/driver.py and
src/driver/mattersim_main.cpp, minus rendering) plus a random-agent mode
(src/driver/random_agent.cpp).

  python scripts/demo.py --scan 17DRP5sb8fy            # interactive
  python scripts/demo.py --scan 17DRP5sb8fy --random 20  # random agent
  python scripts/demo.py --scan X --render --dataset_path /matterport \
      --frames_dir sim_imgs   # also render each view to PNG (JAX cubemap
                              # resampler; like the reference driver window)
"""

from __future__ import annotations

import argparse
import json
import math
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speaker_follower_tpu.env.sim import Simulator


def describe(state):
    print(
        f"\nscan={state.scanId} viewpoint={state.location.viewpointId} "
        f"step={state.step}"
    )
    print(
        f"heading={math.degrees(state.heading):.0f}deg "
        f"elevation={math.degrees(state.elevation):.0f}deg "
        f"viewIndex={state.viewIndex}"
    )
    for i, loc in enumerate(state.navigableLocations):
        marker = "*" if i == 0 else " "
        print(
            f"  [{i}]{marker} {loc.viewpointId[:12]}  "
            f"rel_heading={math.degrees(loc.rel_heading):7.1f}deg  "
            f"rel_elev={math.degrees(loc.rel_elevation):6.1f}deg  "
            f"dist={loc.rel_distance:5.2f}m"
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scan", default="17DRP5sb8fy")
    parser.add_argument("--viewpoint", default=None)
    parser.add_argument("--connectivity", default="/root/reference/connectivity")
    parser.add_argument("--random", type=int, default=0, metavar="STEPS",
                        help="run a random agent for STEPS steps and exit")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--render", action="store_true",
                        help="render RGB frames (needs --dataset_path with "
                        "Matterport skyboxes)")
    parser.add_argument("--dataset_path", default=None)
    parser.add_argument("--frames_dir", default="sim_imgs",
                        help="where rendered frames are written (the "
                        "reference test suite's sim_imgs/ convention)")
    args = parser.parse_args()

    vp = args.viewpoint
    if vp is None:
        with open(
            os.path.join(args.connectivity, f"{args.scan}_connectivity.json")
        ) as f:
            data = json.load(f)
        vp = next(item["image_id"] for item in data if item["included"])

    sim = Simulator()
    sim.setNavGraphPath(args.connectivity)
    sim.setDiscretizedViewingAngles(True)
    sim.setCameraResolution(640, 480)
    sim.setCameraVFOV(math.radians(60))
    if args.render:
        sim.setRenderingEnabled(True)
        sim.setDatasetPath(args.dataset_path)
    sim.init()
    sim.newEpisode(args.scan, vp, 0.0, 0.0)

    frame_count = [0]

    def save_frame():
        if not args.render:
            return
        import cv2

        os.makedirs(args.frames_dir, exist_ok=True)
        s_ = sim.getState()
        path = os.path.join(
            args.frames_dir,
            f"{frame_count[0]:04d}_{s_.location.viewpointId[:8]}_v{s_.viewIndex}.png",
        )
        cv2.imwrite(path, s_.rgb)
        frame_count[0] += 1
        print(f"  frame -> {path}")

    save_frame()

    if args.random:
        rng = random.Random(args.seed)
        for t in range(args.random):
            state = sim.getState()
            ix = rng.randrange(len(state.navigableLocations))
            heading_chg = rng.choice([-1, 0, 1])
            elev_chg = rng.choice([-1, 0, 1])
            sim.makeAction(ix, heading_chg, elev_chg)
            s = sim.getState()
            print(
                f"t={t} -> {s.location.viewpointId[:12]} "
                f"viewIndex={s.viewIndex}"
            )
            save_frame()
        return

    print("commands: <index> = move there, l/r = turn, u/d = look, q = quit")
    while True:
        describe(sim.getState())
        save_frame()
        try:
            cmd = input("> ").strip()
        except EOFError:
            break
        if cmd == "q":
            break
        if cmd == "l":
            sim.makeAction(0, -1, 0)
        elif cmd == "r":
            sim.makeAction(0, 1, 0)
        elif cmd == "u":
            sim.makeAction(0, 0, 1)
        elif cmd == "d":
            sim.makeAction(0, 0, -1)
        elif cmd.isdigit():
            ix = int(cmd)
            if ix < len(sim.getState().navigableLocations):
                sim.makeAction(ix, 0, 0)
            else:
                print("invalid index")
        else:
            print("unknown command")


if __name__ == "__main__":
    main()
