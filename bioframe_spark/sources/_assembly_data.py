"""Assembled-chromosome lengths per genome assembly.

PUBLIC DATABASE FACTS (UCSC goldenPath chrom.sizes / NCBI assembly
reports) — the same public data the reference packages as seqinfo TSVs
(``io/data/*.seqinfo.tsv``). Main (role=assembled) sequences only;
``register_assembly`` accepts fuller seqinfo at deployment time.

organism, provider-build aliases follow the reference registry
(``io/data/_assemblies.yml``).
"""

CHROMSIZES = {
    "hg19": {
        "chr1": 249250621, "chr2": 243199373, "chr3": 198022430,
        "chr4": 191154276, "chr5": 180915260, "chr6": 171115067,
        "chr7": 159138663, "chr8": 146364022, "chr9": 141213431,
        "chr10": 135534747, "chr11": 135006516, "chr12": 133851895,
        "chr13": 115169878, "chr14": 107349540, "chr15": 102531392,
        "chr16": 90354753, "chr17": 81195210, "chr18": 78077248,
        "chr19": 59128983, "chr20": 63025520, "chr21": 48129895,
        "chr22": 51304566, "chrX": 155270560, "chrY": 59373566, "chrM": 16571,
        "chrMT": 16569,
    },
    "hg38": {
        "chr1": 248956422, "chr2": 242193529, "chr3": 198295559,
        "chr4": 190214555, "chr5": 181538259, "chr6": 170805979,
        "chr7": 159345973, "chr8": 145138636, "chr9": 138394717,
        "chr10": 133797422, "chr11": 135086622, "chr12": 133275309,
        "chr13": 114364328, "chr14": 107043718, "chr15": 101991189,
        "chr16": 90338345, "chr17": 83257441, "chr18": 80373285,
        "chr19": 58617616, "chr20": 64444167, "chr21": 46709983,
        "chr22": 50818468, "chrX": 156040895, "chrY": 57227415, "chrM": 16569,
        "chrEBV": 171823,
    },
    "hs1": {
        "chr1": 248387328, "chr2": 242696752, "chr3": 201105948,
        "chr4": 193574945, "chr5": 182045439, "chr6": 172126628,
        "chr7": 160567428, "chr8": 146259331, "chr9": 150617247,
        "chr10": 134758134, "chr11": 135127769, "chr12": 133324548,
        "chr13": 113566686, "chr14": 101161492, "chr15": 99753195,
        "chr16": 96330374, "chr17": 84276897, "chr18": 80542538,
        "chr19": 61707364, "chr20": 66210255, "chr21": 45090682,
        "chr22": 51324926, "chrX": 154259566, "chrY": 62460029, "chrM": 16569,
    },
    "mm9": {
        "chr1": 197195432, "chr2": 181748087, "chr3": 159599783,
        "chr4": 155630120, "chr5": 152537259, "chr6": 149517037,
        "chr7": 152524553, "chr8": 131738871, "chr9": 124076172,
        "chr10": 129993255, "chr11": 121843856, "chr12": 121257530,
        "chr13": 120284312, "chr14": 125194864, "chr15": 103494974,
        "chr16": 98319150, "chr17": 95272651, "chr18": 90772031,
        "chr19": 61342430, "chrX": 166650296, "chrY": 15902555, "chrM": 16299,
    },
    "mm10": {
        "chr1": 195471971, "chr2": 182113224, "chr3": 160039680,
        "chr4": 156508116, "chr5": 151834684, "chr6": 149736546,
        "chr7": 145441459, "chr8": 129401213, "chr9": 124595110,
        "chr10": 130694993, "chr11": 122082543, "chr12": 120129022,
        "chr13": 120421639, "chr14": 124902244, "chr15": 104043685,
        "chr16": 98207768, "chr17": 94987271, "chr18": 90702639,
        "chr19": 61431566, "chrX": 171031299, "chrY": 91744698, "chrM": 16299,
    },
    "mm39": {
        "chr1": 195154279, "chr2": 181755017, "chr3": 159745316,
        "chr4": 156860686, "chr5": 151758149, "chr6": 149588044,
        "chr7": 144995196, "chr8": 130127694, "chr9": 124359700,
        "chr10": 130530862, "chr11": 121973369, "chr12": 120092757,
        "chr13": 120883175, "chr14": 125139656, "chr15": 104073951,
        "chr16": 98008968, "chr17": 95294699, "chr18": 90720763,
        "chr19": 61420004, "chrX": 169476592, "chrY": 91455967, "chrM": 16299,
    },
    "ce10": {
        "chrI": 15072423, "chrII": 15279345, "chrIII": 13783700,
        "chrIV": 17493793, "chrV": 20924149, "chrX": 17718866, "chrM": 13794,
    },
    "ce11": {
        "chrI": 15072434, "chrII": 15279421, "chrIII": 13783801,
        "chrIV": 17493829, "chrV": 20924180, "chrX": 17718942, "chrM": 13794,
    },
    "danRer10": {
        "chr1": 58871917, "chr2": 59543403, "chr3": 62385949, "chr4": 76625712,
        "chr5": 71715914, "chr6": 60272633, "chr7": 74082188, "chr8": 54191831,
        "chr9": 56892771, "chr10": 45574255, "chr11": 45107271,
        "chr12": 49229541, "chr13": 51780250, "chr14": 51944548,
        "chr15": 47771147, "chr16": 55381981, "chr17": 53345113,
        "chr18": 51008593, "chr19": 48790377, "chr20": 55370968,
        "chr21": 45895719, "chr22": 39226288, "chr23": 46272358,
        "chr24": 42251103, "chr25": 36898761, "chrM": 16596,
    },
    "danRer11": {
        "chr1": 59578282, "chr2": 59640629, "chr3": 62628489, "chr4": 78093715,
        "chr5": 72500376, "chr6": 60270059, "chr7": 74282399, "chr8": 54304671,
        "chr9": 56459846, "chr10": 45420867, "chr11": 45484837,
        "chr12": 49182954, "chr13": 52186027, "chr14": 52660232,
        "chr15": 48040578, "chr16": 55266484, "chr17": 53461100,
        "chr18": 51023478, "chr19": 48449771, "chr20": 55201332,
        "chr21": 45934066, "chr22": 39133080, "chr23": 46223584,
        "chr24": 42172926, "chr25": 37502051, "chrM": 16596,
    },
    "dm3": {
        "chr2L": 23011544, "chr2R": 21146708, "chr3L": 24543557,
        "chr3R": 27905053, "chr4": 1351857, "chrX": 22422827, "chrM": 19517,
    },
    "dm6": {
        "chr2L": 23513712, "chr2R": 25286936, "chr3L": 28110227,
        "chr3R": 32079331, "chr4": 1348131, "chrX": 23542271, "chrY": 3667352,
        "chrM": 19524,
    },
    "sacCer3": {
        "chrI": 230218, "chrII": 813184, "chrIII": 316620, "chrIV": 1531933,
        "chrV": 576874, "chrVI": 270161, "chrVII": 1090940, "chrVIII": 562643,
        "chrIX": 439888, "chrX": 745751, "chrXI": 666816, "chrXII": 1078177,
        "chrXIII": 924431, "chrXIV": 784333, "chrXV": 1091291,
        "chrXVI": 948066, "chrM": 85779,
    },
    "wuhCor1": {
        "NC_045512v2": 29903,
    },
}

ORGANISM = {
    "hg19": "homo_sapiens", "hg38": "homo_sapiens", "hs1": "homo_sapiens",
    "mm9": "mus_musculus", "mm10": "mus_musculus", "mm39": "mus_musculus",
    "ce10": "caenorhabditis_elegans", "ce11": "caenorhabditis_elegans",
    "danRer10": "danio_rerio", "danRer11": "danio_rerio",
    "dm3": "drosophila_melanogaster", "dm6": "drosophila_melanogaster",
    "sacCer3": "saccharomyces_cerevisiae", "wuhCor1": "sars_cov_2",
}

# NCBI/other provider-build names -> UCSC assembly name
ALIASES = {
    "GRCh37": "hg19", "GRCh38": "hg38", "T2T-CHM13v2.0": "hs1",
    "MGSCv37": "mm9", "GRCm38": "mm10", "GRCm39": "mm39",
    "WBcel215": "ce10", "WBcel235": "ce11",
    "GRCz10": "danRer10", "GRCz11": "danRer11",
    "dm3": "dm3", "BDGP6": "dm6",
    "R64-1-1": "sacCer3", "ASM985889v3": "wuhCor1",
}

# units that differ from UCSC-name-based inference (see assembly._seq_role_unit)
UNIT_OVERRIDES = {
    "hg19": {'chrMT': 'non-nuclear-revised'},
    "hg38": {'chrEBV': 'decoy'},
}
