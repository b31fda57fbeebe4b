"""Minimal PIL/torch-backed `torchvision` substitute for executing the
reference implementation in this image (torchvision is not installed;
torch-cpu and PIL are).

Importing this module registers `torchvision`, `torchvision.transforms`,
`torchvision.datasets`, `torchvision.models` (+ `.models.resnet`) in
`sys.modules`, each providing ONLY the names the reference code in
/root/reference imports and calls on the pretrain/lin-eval path:

  * data.py:3               -> transforms.{Compose, ToTensor, Normalize,
                               RandomResizedCrop, RandomHorizontalFlip,
                               ColorJitter, RandomApply, RandomGrayscale,
                               GaussianBlur, CenterCrop, RandomAffine},
                               datasets.{CIFAR10, STL10}
  * models/resnets.py:1     -> models.resnet.{ResNet, Bottleneck}

Semantics follow torchvision's documented behaviour (same parameter
sampling, same PIL operations, same module/key layout for state_dict
interop — the layout our utils/torch_port converter and its tests pin).
This is a faithful reimplementation of public torchvision API surface,
not reference code; it exists so scripts/reference_shootout.py can run
the reference's own Dataset subclass, augmentation pipeline, model
classes and training loop unmodified.
"""

from __future__ import annotations

import random
import sys
import types

import numpy as np
import torch
from PIL import Image, ImageEnhance
from torch import nn

# --------------------------------------------------------------------------
# transforms
# --------------------------------------------------------------------------


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class ToTensor:
    def __call__(self, img):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1).copy())


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32)[:, None, None]
        self.std = torch.tensor(std, dtype=torch.float32)[:, None, None]

    def __call__(self, t):
        return (t - self.mean) / self.std


class RandomResizedCrop:
    """torchvision sampling: area scale U(0.08, 1), log-uniform aspect in
    (3/4, 4/3), 10 attempts then center-crop fallback; bilinear resize."""

    def __init__(self, size, scale=(0.08, 1.0), ratio=(3. / 4., 4. / 3.)):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale, self.ratio = scale, ratio

    def get_params(self, img):
        w, h = img.size
        area = w * h
        log_ratio = (np.log(self.ratio[0]), np.log(self.ratio[1]))
        for _ in range(10):
            target_area = area * random.uniform(*self.scale)
            aspect = np.exp(random.uniform(*log_ratio))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                i = random.randint(0, h - ch)
                j = random.randint(0, w - cw)
                return i, j, ch, cw
        # Fallback: largest center crop within the ratio bounds.
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            ch, cw = h, int(round(h * self.ratio[1]))
        else:
            cw, ch = w, h
        return (h - ch) // 2, (w - cw) // 2, ch, cw

    def __call__(self, img):
        i, j, ch, cw = self.get_params(img)
        return img.resize(self.size, Image.BILINEAR,
                          box=(j, i, j + cw, i + ch))


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if random.random() < self.p:
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img


def _adjust_hue(img, hue_factor):
    # torchvision F_pil.adjust_hue: uint8 HSV hue channel shifted with
    # wraparound by hue_factor*255.
    if img.mode in ("L", "1", "I", "F"):
        return img
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    with np.errstate(over="ignore"):
        np_h += np.uint8(int(hue_factor * 255) & 0xFF)
    h = Image.fromarray(np_h, "L")
    return Image.merge("HSV", (h, s, v)).convert(img.mode)


class ColorJitter:
    """torchvision sampling: each factor U(max(0,1-x), 1+x) (hue U(-h,h)),
    the four adjustments applied in a random order."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue

    def __call__(self, img):
        ops = []
        if self.brightness:
            f = random.uniform(max(0.0, 1 - self.brightness),
                               1 + self.brightness)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f = random.uniform(max(0.0, 1 - self.contrast),
                               1 + self.contrast)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation:
            f = random.uniform(max(0.0, 1 - self.saturation),
                               1 + self.saturation)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        if self.hue:
            f = random.uniform(-self.hue, self.hue)
            ops.append(lambda im, f=f: _adjust_hue(im, f))
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


class RandomApply:
    def __init__(self, transforms, p=0.5):
        self.transforms = transforms
        self.p = p

    def __call__(self, img):
        if random.random() < self.p:
            for t in self.transforms:
                img = t(img)
        return img


class RandomGrayscale:
    def __init__(self, p=0.1):
        self.p = p

    def __call__(self, img):
        if random.random() < self.p:
            return img.convert("L").convert(img.mode)
        return img


class GaussianBlur:
    """Separable Gaussian with reflect padding on the pixel array —
    torchvision's tensor-path semantics (kernel truncated at kernel_size,
    sigma U(0.1, 2.0) per call), rounded back to uint8 PIL."""

    def __init__(self, kernel_size, sigma=(0.1, 2.0)):
        self.kernel_size = (kernel_size if kernel_size % 2 == 1
                            else kernel_size + 1)
        self.sigma = sigma if isinstance(sigma, (tuple, list)) \
            else (sigma, sigma)

    def __call__(self, img):
        sigma = random.uniform(*self.sigma)
        k = self.kernel_size
        x = np.arange(k, dtype=np.float32) - (k - 1) / 2.0
        kern = np.exp(-(x ** 2) / (2 * sigma ** 2))
        kern /= kern.sum()
        arr = np.asarray(img, dtype=np.float32)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        pad = k // 2
        a = np.pad(arr, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
        a = sum(a[i:i + arr.shape[0]] * kern[i] for i in range(k))
        a = np.pad(a, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        a = sum(a[:, i:i + arr.shape[1]] * kern[i] for i in range(k))
        out = np.clip(np.round(a), 0, 255).astype(np.uint8)
        return Image.fromarray(out.squeeze())


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        w, h = img.size
        th, tw = self.size
        i, j = (h - th) // 2, (w - tw) // 2
        return img.crop((j, i, j + tw, i + th))


class RandomAffine:
    """Translate-only affine, reimplemented from torchvision's documented
    behavior for the reference's supervised stack (data.py:213-216:
    ``RandomAffine(degrees=0, translate=(0.3, 0.3))``, applied AFTER
    ToTensor/Normalize, so the input here is a (C,H,W) float tensor).
    torchvision samples integer pixel shifts uniformly in
    [-round(W*tx), +round(W*tx)] x [-round(H*ty), +round(H*ty)] and
    fills vacated pixels with 0."""

    def __init__(self, degrees=0, translate=None, **kw):
        if degrees not in (0, (0, 0)) or not translate:
            raise NotImplementedError(
                "torchvision shim RandomAffine: only degrees=0 + "
                "translate (the reference's supervised stack) is "
                "implemented")
        self.translate = tuple(translate)

    def __call__(self, t):
        arr = t.numpy() if isinstance(t, torch.Tensor) else np.asarray(t)
        c, h, w = arr.shape
        max_dx = round(self.translate[0] * w)
        max_dy = round(self.translate[1] * h)
        tx = int(round(random.uniform(-max_dx, max_dx)))
        ty = int(round(random.uniform(-max_dy, max_dy)))
        out = np.zeros_like(arr)
        src_x = slice(max(0, -tx), min(w, w - tx))
        dst_x = slice(max(0, tx), min(w, w + tx))
        src_y = slice(max(0, -ty), min(h, h - ty))
        dst_y = slice(max(0, ty), min(h, h + ty))
        out[:, dst_y, dst_x] = arr[:, src_y, src_x]
        return torch.from_numpy(out)


# --------------------------------------------------------------------------
# models.resnet — the public torchvision ResNet/Bottleneck the reference
# encoder subclasses (state_dict key layout identical to torchvision's,
# which utils/torch_port and tests/test_torch_parity.py pin).
# --------------------------------------------------------------------------


def _conv1x1(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 1, stride=stride, bias=False)


def _conv3x3(cin, cout, stride=1):
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 norm_layer=nn.BatchNorm2d):
        super().__init__()
        self.conv1 = _conv1x1(inplanes, planes)
        self.bn1 = norm_layer(planes)
        self.conv2 = _conv3x3(planes, planes, stride)
        self.bn2 = norm_layer(planes)
        self.conv3 = _conv1x1(planes, planes * self.expansion)
        self.bn3 = norm_layer(planes * self.expansion)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self._norm_layer = nn.BatchNorm2d
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = self._norm_layer(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                _conv1x1(self.inplanes, planes * block.expansion, stride),
                self._norm_layer(planes * block.expansion))
        layers = [block(self.inplanes, planes, stride, downsample,
                        self._norm_layer)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes,
                                norm_layer=self._norm_layer))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x)
        return self.fc(torch.flatten(x, 1))


def resnet50(**kw):
    return ResNet(Bottleneck, [3, 4, 6, 3], **kw)


# --------------------------------------------------------------------------
# datasets — class shells; real construction would download (no egress),
# so shootout code instantiates around __init__ and fills data/targets.
# --------------------------------------------------------------------------


class _ArrayVisionDataset(torch.utils.data.Dataset):
    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "torchvision shim: dataset download is unavailable in this "
            "image; build with __new__ and set data/targets/transform "
            "(see scripts/reference_shootout.py)")

    def __len__(self):
        return len(self.data)

    def __getitem__(self, idx):
        img = Image.fromarray(self.data[idx])
        if self.transform is not None:
            img = self.transform(img)
        return img, int(self.targets[idx])


class CIFAR10(_ArrayVisionDataset):
    pass


class STL10(_ArrayVisionDataset):
    pass


# --------------------------------------------------------------------------
# sys.modules registration
# --------------------------------------------------------------------------

_tv = types.ModuleType("torchvision")
_transforms = types.ModuleType("torchvision.transforms")
_datasets = types.ModuleType("torchvision.datasets")
_models = types.ModuleType("torchvision.models")
_resnet = types.ModuleType("torchvision.models.resnet")

for _name, _obj in [
    ("Compose", Compose), ("ToTensor", ToTensor), ("Normalize", Normalize),
    ("RandomResizedCrop", RandomResizedCrop),
    ("RandomHorizontalFlip", RandomHorizontalFlip),
    ("ColorJitter", ColorJitter), ("RandomApply", RandomApply),
    ("RandomGrayscale", RandomGrayscale), ("GaussianBlur", GaussianBlur),
    ("CenterCrop", CenterCrop), ("RandomAffine", RandomAffine),
]:
    setattr(_transforms, _name, _obj)

_datasets.CIFAR10 = CIFAR10
_datasets.STL10 = STL10
_resnet.ResNet = ResNet
_resnet.Bottleneck = Bottleneck
_models.resnet = _resnet
_models.resnet50 = resnet50
_tv.transforms = _transforms
_tv.datasets = _datasets
_tv.models = _models

for _mod in (_tv, _transforms, _datasets, _models, _resnet):
    sys.modules.setdefault(_mod.__name__, _mod)
