#!/usr/bin/env python
"""Emit a shell script that runs Trimmomatic on paired fastq files.

Scans the current directory for *R1*.fastq.gz files, pairs each with
its R2 twin, and prints shell commands that trim the pair with
Trimmomatic, re-interleave the paired survivors, and collect the
orphans. Behavioral contract of reference
sandbox/write-trimmomatic.py:37-56.

% python sandbox/write-trimmomatic.py > trim.sh
"""

import glob

TRIMMOMATIC = "/usr/local/bin/trimmomatic-0.30.jar"
ADAPTERS = "/usr/local/share/adapters/TruSeq3-PE.fa"
INTERLEAVE = "/usr/local/share/khmer/scripts/interleave-reads.py"

BLOCK = """\
mkdir trim
cd trim
java -jar {jar} PE ../{r1} ../{r2} s1_pe s1_se s2_pe s2_se \
ILLUMINACLIP:{adapters}:2:30:10
{interleave} s1_pe s2_pe | gzip -9c > ../{pe}

cat s1_se s2_se | gzip -9c > ../{se}
cd ..
rm -r ./trim/

chmod u-w {pe} {se}
"""


def commands_for(r1):
    """The shell block trimming one R1/R2 pair."""
    stem = r1[:-len(".fastq.gz")]
    return BLOCK.format(jar=TRIMMOMATIC, adapters=ADAPTERS,
                        interleave=INTERLEAVE, r1=r1,
                        r2=r1.replace("R1", "R2"),
                        pe=stem + ".pe.fq.gz", se=stem + ".se.fq.gz")


def main():
    for r1 in glob.glob("*R1*.fastq.gz"):
        print(commands_for(r1))


if __name__ == '__main__':
    main()
