DELETE FROM integers WHERE i%2=0;
DELETE FROM integers WHERE i%2=0;
